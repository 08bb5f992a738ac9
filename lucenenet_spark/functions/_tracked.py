"""Per-invocation persist scopes for iterative LAZY plan builders.

An iterative builder (k-center rounds, set-cover rounds, k-core peels,
BFS frontiers) persists one frame per round, but returns a lazy plan —
it cannot unpersist in a finally block because the caller's action runs
later, and every round's frame is referenced by the final plan.  Without
any release, a long-lived session accumulates cached partitions forever
(r5 ADVICE).  A RoundScope releases the PREVIOUS invocation's frames
when the next invocation of the same builder begins (by then the usual
collect-per-call pattern has consumed them; an uncollected older plan
stays correct and merely recomputes), and `release()` gives callers
deterministic cleanup after their action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPES: list["RoundScope"] = []


class RoundScope:
    def __init__(self) -> None:
        self._live: list[DataFrame] = []
        _SCOPES.append(self)

    def begin(self) -> None:
        """Start a new invocation: release the previous one's frames."""
        self.release()

    def track(self, df: DataFrame) -> DataFrame:
        df.persist()
        self._live.append(df)
        return df

    def release(self) -> None:
        for df in self._live:
            df.unpersist()
        self._live = []


def release_all() -> None:
    """Unpersist every live round-scoped intermediate (call after your
    action for deterministic cleanup)."""
    for scope in _SCOPES:
        scope.release()
