"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windowed aggregations (streaming/windows.py) cover the
declarative cases; this is the escape hatch for *imperative* per-key
state machines — fraud counters, session enrichment, CDC merge,
anything where the update rule is code, not an aggregate expression.

Operator here: per-user running totals. State = (event count, value
sum); each micro-batch folds its rows into the state and emits the
updated snapshot — so the sink always holds the latest per-user
totals (output mode "update").

Mechanics worth knowing at 100 TB:

- state lives in the state store, partitioned by the grouping key:
  one shuffle on user_id per batch, state co-located with its key's
  executor. State size = O(distinct users) x 16 bytes — bounded.
- the pandas function receives ALL rows of one key in the batch as
  Arrow batches; per-batch work is vectorized numpy.
- timeouts (GroupStateTimeout) GC idle keys; we keep NoTimeout since
  user totals are meant to live forever.
- the UDF closure is shipped by value (nested def) so external
  drivers run it without this package on executor PYTHONPATH.

Differential check: with trigger=availableNow over a static file the
final emitted snapshot per user must equal the batch groupBy — the
same stream≡batch discipline as the windowing tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user (count, sum(value)) maintained across
    micro-batches; emits the updated snapshot for keys seen in each
    batch."""

    def update(key, pdfs, state):
        import pandas as pd

        user_id = key[0]
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": round(total, 2)}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
