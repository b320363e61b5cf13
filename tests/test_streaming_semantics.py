"""Streaming stateful-processor logic tests that need no streaming
runtime.

The TWS processor (`_TopKProcessor`) can only BIND into a live
transformWithStateInPandas query where `google.protobuf` exists — not
in this image (r12 verdict ask #8). Its fold logic is plain Python
over pandas, though, so this file drives `handleInputRows` directly
with stub state handles and pins it row-for-row to the
oracle-verified `applyInPandasWithState` fallback on the same
micro-batch sequences: the processor class stays exercised code, and
a divergence between the two folds (the bug class the twin design
risks) fails the suite instead of waiting for a protobuf-equipped
environment to surface it.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from snapshot_s3_util_spark.streaming.stateful import (
    _TopKProcessor,
    _topk_update_fallback,
)


class _StubValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _StubListState:
    def __init__(self):
        self._rows = None

    def exists(self):
        return self._rows is not None

    def get(self):
        return list(self._rows)

    def put(self, rows):
        self._rows = list(rows)


class _StubHandle:
    """Stands in for the TWS StatefulProcessorHandle: hands out named
    state primitives exactly as init() requests them."""

    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _StubValueState())

    def getListState(self, name, schema):
        return self.states.setdefault(name, _StubListState())


class _StubGroupState:
    """Stands in for pyspark GroupState: .exists/.get properties +
    .update(tuple), which is all the fallback fold touches."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _norm(pdf: pd.DataFrame) -> list:
    out = []
    for r in pdf.to_dict("records"):
        out.append(
            {
                k: (None if isinstance(v, float) and math.isnan(v) else v)
                for k, v in r.items()
            }
        )
    return out


_BATCH_SEQUENCES = [
    # ordinary growth past the top-3 window
    [[1.0, 5.0], [3.0], [9.0, 2.0, 7.0]],
    # NaN ≡ NULL pin: counted in n_events, never ranked
    [[float("nan"), 4.0], [float("nan")], [6.0, float("nan"), 1.0]],
    # all-NaN key: n_events grows, top stays empty, sums stay NULL
    [[float("nan")], [float("nan"), float("nan")]],
    # ties: the top-3 multiset keeps duplicates
    [[5.0, 5.0], [5.0, 5.0, 2.0]],
    # empty micro-batch mid-stream
    [[2.0], [], [8.0]],
]


@pytest.mark.parametrize("values", _BATCH_SEQUENCES)
def test_tws_processor_matches_fallback_fold(values):
    key = (42,)
    proc = _TopKProcessor()
    proc.init(_StubHandle())
    gs = _StubGroupState()
    for batch in values:
        pdf = pd.DataFrame({"value": pd.Series(batch, dtype="float64")})
        got = list(proc.handleInputRows(key, [pdf], None))
        want = list(_topk_update_fallback(key, [pdf], gs))
        assert len(got) == len(want) == 1
        assert _norm(got[0]) == _norm(want[0]), (batch, values)


def test_tws_processor_timer_and_close_are_noops():
    proc = _TopKProcessor()
    proc.init(_StubHandle())
    assert list(proc.handleExpiredTimer((1,), None, None)) == []
    proc.handleInitialState((1,), None, None)
    proc.close()
