"""datar_polars_spark — a PySpark-native grammar-of-data-manipulation engine.

Re-hosts the dplyr/tidyr/forcats verb + expression surface of
``pwwang/datar-polars`` (reference at /root/reference, read-only) on
Spark DataFrames: expressions compile to ``pyspark.sql.Column``, verbs
compile to the DataFrame API, Catalyst/Tungsten do the optimizing.

    from datar_polars_spark import f, mutate, group_by, summarise
    from datar_polars_spark.functions import sum_, mean

    out = td >> group_by(f.g) >> summarise(total=sum_(f.x))
"""

from .plans.expr import f, Call, Expr, Ref  # noqa: F401
from .plans.selection import (  # noqa: F401
    c_,
    starts_with,
    ends_with,
    contains,
    matches,
    everything,
    last_col,
    all_of,
    any_of,
    num_range,
    where,
    is_numeric,
    is_character,
)
from .tibble import Tibble, ensure_tibble, tibble, from_pandas  # noqa: F401
from .plans.cache import (  # noqa: F401
    release_internal_caches,
    internal_cache_count,
)
from .operators.core import *  # noqa: F401,F403
from .operators.join import *  # noqa: F401,F403
from .operators.bind import *  # noqa: F401,F403
from .operators.tidyr import *  # noqa: F401,F403
from .operators.factor import *  # noqa: F401,F403
from .operators.group_meta import *  # noqa: F401,F403
from .operators.tibble_verbs import *  # noqa: F401,F403
from .operators.misc import *  # noqa: F401,F403
from .functions.across import across  # noqa: F401
from .sources import (  # noqa: F401
    read_parquet,
    read_csv,
    read_json,
    read_orc,
    load_tables,
    write_parquet,
    write_csv,
    write_json,
    write_orc,
    write_bucketed,
    write_clustered,
    write_training_shards,
    write_zordered,
    zorder_key,
    read_table,
    read_text,
    write_text,
    read_binary,
    sql_,
    connect,
)
from . import scale  # noqa: F401  (registers text-analysis functions)
from .datasets import load_dataset, descr_datasets, get_versions  # noqa: F401

__version__ = "0.1.0"
