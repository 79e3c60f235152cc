"""Vendored public-suffix-list snapshot + parser.

The Public Suffix List (PSL) is public, MPL-2.0-licensed data
maintained by Mozilla at https://publicsuffix.org/list/
(raw file: https://publicsuffix.org/list/public_suffix_list.dat).
This container has no network access, so ``PSL_SNAPSHOT`` below is a
CURATED SUBSET of the list (a few hundred of the highest-traffic
entries, hand-checked against the upstream format: exact rules,
``*.`` wildcard rules, and ``!`` exception rules). It is therefore
*more* complete than a two-label heuristic but *less* complete than
the real list — production deployments should load the full upstream
file with :func:`load_psl` / ``parse_psl`` and pass the resulting
rules to ``url_registrable_domain(..., rules=...)``.

Matching semantics implemented downstream (scale/urls.py) follow the
published algorithm at https://publicsuffix.org/list/ : the longest
matching rule wins; exception rules beat wildcard rules; a host that
matches no rule uses the implicit ``*`` rule (its public suffix is the
last label, so the registrable domain is the last two labels).
"""

from __future__ import annotations

from typing import NamedTuple

__all__ = ["PSLRules", "parse_psl", "load_psl", "PSL_SNAPSHOT", "psl_rules"]


class PSLRules(NamedTuple):
    """Parsed PSL rule sets. ``exact``: full suffix names.
    ``wildcard``: the PARENT of each ``*.`` rule (the rule
    ``*.compute.amazonaws.com`` is stored as ``compute.amazonaws.com``).
    ``exception``: full names of ``!`` rules (each IS a registrable
    domain)."""

    exact: frozenset
    wildcard: frozenset
    exception: frozenset


def parse_psl(text: str) -> PSLRules:
    """Parse public_suffix_list.dat content (upstream format: one rule
    per line, ``//`` comments, blank lines ignored, punycode/unicode
    labels taken verbatim, ``*.`` wildcards, ``!`` exceptions)."""
    exact, wildcard, exception = set(), set(), set()
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0].lower()
        if line.startswith("!"):
            exception.add(line[1:])
        elif line.startswith("*."):
            wildcard.add(line[2:])
        elif line != "*":
            exact.add(line)
    return PSLRules(frozenset(exact), frozenset(wildcard), frozenset(exception))


def load_psl(path: str) -> PSLRules:
    """Load a full upstream ``public_suffix_list.dat`` from disk."""
    with open(path, encoding="utf-8") as fh:
        return parse_psl(fh.read())


# Curated snapshot (see module docstring). Single-label TLD rules are
# intentionally omitted: they coincide with the implicit '*' default
# rule (registrable domain = last two labels) and would only bloat the
# generated expression.
PSL_SNAPSHOT = """
// ---- ICANN section (subset) ----
// United Kingdom
co.uk
org.uk
gov.uk
ac.uk
me.uk
net.uk
ltd.uk
plc.uk
sch.uk
nhs.uk
police.uk
// Japan (generic + major prefectures + wildcard city domains)
co.jp
ne.jp
or.jp
ac.jp
go.jp
ad.jp
ed.jp
gr.jp
lg.jp
tokyo.jp
osaka.jp
kyoto.jp
hokkaido.jp
okinawa.jp
aichi.jp
fukuoka.jp
hiroshima.jp
kanagawa.jp
saitama.jp
chiba.jp
hyogo.jp
shizuoka.jp
miyagi.jp
nagano.jp
niigata.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// Australia / New Zealand
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
geek.nz
gen.nz
maori.nz
iwi.nz
// South Africa / Kenya / Nigeria / Tanzania / Uganda / Ghana
co.za
net.za
org.za
gov.za
ac.za
web.za
edu.za
co.ke
or.ke
ne.ke
go.ke
ac.ke
sc.ke
me.ke
info.ke
com.ng
net.ng
org.ng
edu.ng
gov.ng
name.ng
sch.ng
co.tz
or.tz
go.tz
ac.tz
ne.tz
co.ug
or.ug
ac.ug
go.ug
ne.ug
sc.ug
com.gh
edu.gh
gov.gh
org.gh
mil.gh
// Brazil / Mexico / Argentina / Peru / Venezuela / Colombia
com.br
net.br
org.br
gov.br
edu.br
art.br
blog.br
eco.br
com.mx
net.mx
org.mx
edu.mx
gob.mx
com.ar
net.ar
org.ar
edu.ar
gob.ar
gov.ar
int.ar
mil.ar
tur.ar
com.pe
net.pe
org.pe
edu.pe
gob.pe
mil.pe
nom.pe
com.ve
net.ve
org.ve
edu.ve
gob.ve
mil.ve
web.ve
co.ve
info.ve
com.co
net.co
org.co
edu.co
gov.co
mil.co
nom.co
// India / China / Korea / Taiwan / Hong Kong / Singapore
co.in
net.in
org.in
gov.in
ac.in
firm.in
gen.in
ind.in
nic.in
res.in
edu.in
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
mil.cn
ah.cn
bj.cn
sh.cn
gd.cn
js.cn
zj.cn
sc.cn
co.kr
or.kr
go.kr
ac.kr
ne.kr
re.kr
pe.kr
mil.kr
es.kr
hs.kr
ms.kr
kg.kr
seoul.kr
busan.kr
com.tw
net.tw
org.tw
edu.tw
gov.tw
idv.tw
com.hk
net.hk
org.hk
edu.hk
gov.hk
idv.hk
com.sg
net.sg
org.sg
edu.sg
gov.sg
per.sg
// Malaysia / Philippines / Thailand / Indonesia / Vietnam
com.my
net.my
org.my
edu.my
gov.my
mil.my
name.my
com.ph
net.ph
org.ph
edu.ph
gov.ph
ngo.ph
mil.ph
i.ph
co.th
net.th
or.th
ac.th
go.th
in.th
mi.th
co.id
net.id
or.id
ac.id
go.id
web.id
sch.id
mil.id
biz.id
my.id
com.vn
net.vn
org.vn
edu.vn
gov.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
// Israel / Turkey / Gulf / Egypt / Jordan / Lebanon
co.il
net.il
org.il
ac.il
gov.il
muni.il
idf.il
k12.il
com.tr
net.tr
org.tr
edu.tr
gov.tr
mil.tr
av.tr
bel.tr
biz.tr
dr.tr
gen.tr
info.tr
k12.tr
name.tr
tel.tr
tv.tr
web.tr
co.ae
net.ae
org.ae
ac.ae
gov.ae
mil.ae
sch.ae
com.kw
edu.kw
gov.kw
net.kw
org.kw
com.qa
edu.qa
gov.qa
net.qa
org.qa
mil.qa
name.qa
sch.qa
com.om
edu.om
gov.om
net.om
org.om
med.om
museum.om
pro.om
com.sa
net.sa
org.sa
edu.sa
gov.sa
med.sa
pub.sa
sch.sa
com.eg
net.eg
org.eg
edu.eg
gov.eg
eun.eg
mil.eg
name.eg
sci.eg
com.jo
net.jo
org.jo
edu.jo
gov.jo
mil.jo
name.jo
sch.jo
com.lb
edu.lb
gov.lb
net.lb
org.lb
// Europe (ccTLDs with second-level registration)
com.pl
net.pl
org.pl
edu.pl
info.pl
waw.pl
wroc.pl
krakow.pl
poznan.pl
com.ru
net.ru
org.ru
pp.ru
msk.ru
spb.ru
com.ua
net.ua
org.ua
edu.ua
gov.ua
in.ua
kiev.ua
kyiv.ua
lviv.ua
dp.ua
com.gr
net.gr
org.gr
edu.gr
gov.gr
asso.fr
com.fr
gouv.fr
nom.fr
prd.fr
tm.fr
com.es
nom.es
org.es
gob.es
edu.es
com.pt
edu.pt
gov.pt
int.pt
net.pt
org.pt
publ.pt
com.ro
org.ro
tm.ro
nt.ro
nom.ro
info.ro
rec.ro
arts.ro
firm.ro
store.ro
www.ro
ac.at
co.at
gv.at
or.at
ac.be
// United States (state space, representative subset)
dc.us
ca.us
ny.us
tx.us
fl.us
wa.us
ma.us
il.us
pa.us
oh.us
k12.ca.us
k12.ny.us
k12.tx.us
k12.fl.us
k12.wa.us
k12.ma.us
k12.il.us
k12.pa.us
k12.oh.us
cc.ca.us
cc.ny.us
lib.ca.us
lib.ny.us
// wildcard-only ccTLDs
*.bd
*.ck
!www.ck
*.er
*.jm
*.kh
*.mm
*.np
*.pg
// ---- PRIVATE section (subset: high-traffic hosting platforms) ----
github.io
githubusercontent.com
gitlab.io
blogspot.com
blogspot.co.uk
blogspot.ca
blogspot.com.au
blogspot.com.br
blogspot.de
blogspot.fr
blogspot.in
blogspot.it
blogspot.jp
blogspot.mx
blogspot.nl
blogspot.se
blogspot.sg
wordpress.com
cloudfront.net
herokuapp.com
herokussl.com
netlify.app
vercel.app
now.sh
web.app
firebaseapp.com
appspot.com
pages.dev
workers.dev
fly.dev
onrender.com
readthedocs.io
neocities.org
surge.sh
glitch.me
azurewebsites.net
s3.amazonaws.com
s3.us-east-2.amazonaws.com
s3.us-west-2.amazonaws.com
s3.eu-west-1.amazonaws.com
s3-website-us-east-1.amazonaws.com
*.compute.amazonaws.com
*.compute-1.amazonaws.com
*.elb.amazonaws.com
duckdns.org
"""

_SNAPSHOT_RULES = None


def psl_rules() -> PSLRules:
    """The parsed snapshot rules (parsed once, cached)."""
    global _SNAPSHOT_RULES
    if _SNAPSHOT_RULES is None:
        _SNAPSHOT_RULES = parse_psl(PSL_SNAPSHOT)
    return _SNAPSHOT_RULES
