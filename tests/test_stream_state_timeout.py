"""Idle-key state expiry for the applyInPandasWithState operators
(r12 ADVICE fix): on a timeout callback the update functions must
remove the state and emit nothing — never re-update or re-arm the
timeout (which kept every key alive forever and grew the store
unboundedly). Tested against a fake GroupState because a real
ProcessingTimeTimeout needs wall-clock between triggers."""

import pandas as pd

from datar_polars_spark.streaming import _cap_update, _running_agg_update


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = []
        self.timeouts = []

    @property
    def exists(self):
        return self._value is not None and not self.removed

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v
        self.updated.append(v)

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeouts.append(ms)


def test_cap_timeout_removes_state_and_emits_nothing():
    update = _cap_update(cap=3, out_cols=["doc_id", "domain"], to_ms=60000)
    st = FakeState(value=(3,), timed_out=True)
    out = list(update(("d.com",), iter([]), st))
    assert out == []
    assert st.removed
    assert st.updated == []   # no re-update
    assert st.timeouts == []  # no re-arm


def test_cap_data_invocation_arms_timeout_and_counts():
    update = _cap_update(cap=3, out_cols=["doc_id", "domain"], to_ms=60000)
    st = FakeState()
    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4], "domain": ["d"] * 4})
    out = list(update(("d",), iter([pdf]), st))
    assert len(out) == 1 and len(out[0]) == 3  # cap honored
    assert st.updated == [(3,)]
    assert st.timeouts == [60000]


def test_cap_readmits_after_expiry():
    """The documented rolling cap: once the idle timeout removed the
    counter, the key's next appearance starts from zero."""
    update = _cap_update(cap=2, out_cols=["doc_id", "domain"], to_ms=60000)
    st = FakeState(value=(2,), timed_out=True)
    list(update(("d",), iter([]), st))
    assert st.removed
    # next trigger: fresh state object (the store dropped the key)
    st2 = FakeState()
    pdf = pd.DataFrame({"doc_id": [9], "domain": ["d"]})
    out = list(update(("d",), iter([pdf]), st2))
    assert len(out) == 1 and out[0]["doc_id"].tolist() == [9]


def test_running_agg_timeout_removes_state_and_emits_nothing():
    update = _running_agg_update(["domain"], "value", timeout_minutes=1)
    st = FakeState(value=(5, 10.0, 4.0), timed_out=True)
    out = list(update(("d.com",), iter([]), st))
    assert out == []
    assert st.removed
    assert st.updated == []
    assert st.timeouts == []


def test_running_agg_data_invocation_unchanged():
    update = _running_agg_update(["domain"], "value", timeout_minutes=1)
    st = FakeState()
    pdf = pd.DataFrame({"domain": ["d"] * 3, "value": [1.0, 2.0, 7.0]})
    (row_df,) = list(update(("d",), iter([pdf]), st))
    assert row_df["n_events"].tolist() == [3]
    assert row_df["total"].tolist() == [10.0]
    assert row_df["max_value"].tolist() == [7.0]
    assert st.updated == [(3, 10.0, 7.0)]
    assert st.timeouts == [60000]
