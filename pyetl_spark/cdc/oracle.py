"""Sequential pandas oracle — the ground truth for CDC replay tests.

Replays change events one at a time in seq order into a plain dict keyed
``(repo, path)`` (exactly the reference's single-threaded object stream:
lecture → transformation → ecriture, moteur/moteur.py:174), applying the
same transform rules via a pandas mirror. The engine's distributed,
out-of-order, batched replay must converge to byte-identical table state —
per-row ``sha256(content)`` equality (north_rule verify clause).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Sequence

import pandas as pd


def replay_oracle(
    events: pd.DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
    op_col: str = "op",
    transform: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> pd.DataFrame:
    """Sequential LWW replay → final visible table state (deletes applied)."""
    ev = events.sort_values(seq_col, kind="mergesort").reset_index(drop=True)
    if transform is not None:
        ev = transform(ev)
    state: dict[tuple, dict] = {}
    payload_cols = [c for c in ev.columns if c not in (op_col,)]
    for row in ev.itertuples(index=False):
        d = dict(zip(ev.columns, row))
        k = tuple(d[c] for c in keys)
        if d[op_col] == "delete":
            state.pop(k, None)
        else:
            state[k] = {c: d[c] for c in payload_cols}
    if not state:
        return pd.DataFrame(columns=payload_cols)
    out = pd.DataFrame(list(state.values()))
    return out.sort_values(list(keys), kind="mergesort").reset_index(drop=True)


def content_hashes(df: pd.DataFrame, keys: Sequence[str] = ("repo", "path"), content: str = "content") -> dict[tuple, str]:
    """per-key sha256(content) — the per-row invariant vs the reference."""
    return {
        tuple(getattr(r, k) for k in keys): hashlib.sha256(
            (getattr(r, content) or "").encode()
        ).hexdigest()
        for r in df.itertuples(index=False)
    }
