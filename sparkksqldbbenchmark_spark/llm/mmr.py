"""Cogrouped MMR greedy selection (r18, guide §2.4/§4.2).

The MMR rows bound their candidates to a tiny per-source slice BEFORE
anything pairwise (the production shape: MMR diversifies a retriever's
short-list). r17 already collapsed their per-round similarity joins
into a map column, but each of the k greedy rounds still materialized
a bounded argmax aggregate chained through a broadcast-exclusion join —
k serialized stages per query, dozens of Exchange references.

Since the whole greedy state for one source is ≤ nc candidate rows and
≤ nc² similarity pairs, the ENTIRE selection collapses into ONE
`applyInPandas` over the source-COGROUPED candidate and pair-sim
frames. Both descend from the source-partitioned candidate checkpoint,
so the cogroup adds no exchange. The Python replica runs the identical
integer arithmetic as the relational unroll:

- score_i(d) = rel(d) − w · msim_i(d), all integer micros;
- argmax key = (−score) · 2³³ + doc_id, picked by MIN (doc_id
  tie-break); key magnitude < 2⁶³ and Python ints are exact;
- after pick p: msim(d) ← max(msim(d), sim(d, p)), missing pair = 0;
- pick i exists iff the source still has an unpicked candidate —
  exactly the old per-round argmax-over-nonempty-group semantics.

Emits one row per pick: (source, select_rank, doc_id, rel_micros,
max_sim_to_prior_micros) with rank-1 msim = 0, matching the unrolled
readout column for column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = 8589934592  # 2^33

PICKS_SCHEMA = (
    "source string, select_rank long, doc_id long,"
    " rel_micros long, max_sim_to_prior_micros long"
)


def mmr_greedy_picks(
    cand: DataFrame, sim: DataFrame, k: int, w: int
) -> DataFrame:
    """Greedy MMR picks per source.

    ``cand``: (source, doc_id, rel) — the bounded candidate slice,
    hash-partitioned by source (checkpointed upstream).
    ``sim``: (source, da, db, s) — pairwise similarity micros on the
    same partitioning. ``k`` rounds, similarity weight ``w``.
    """
    import pandas as pd

    def picks_group(key, cpdf, spdf):
        src = key[0]
        rel = {
            int(d): int(r) for d, r in zip(cpdf["doc_id"], cpdf["rel"])
        }
        simd = {
            (int(da), int(db)): int(s)
            for da, db, s in zip(spdf["da"], spdf["db"], spdf["s"])
        }
        avail = set(rel)
        msim = dict.fromkeys(avail, 0)
        rows = []
        for i in range(1, k + 1):
            if not avail:
                break
            best_key = best_d = None
            for d in avail:
                score = rel[d] - w * msim[d]
                akey = (-score) * _KEY + d
                if best_key is None or akey < best_key:
                    best_key, best_d = akey, d
            avail.discard(best_d)
            rows.append(
                (src, i, best_d, rel[best_d], msim[best_d] if i > 1 else 0)
            )
            for d in avail:
                s2 = simd.get((d, best_d), 0)
                if s2 > msim[d]:
                    msim[d] = s2
        return pd.DataFrame(
            rows,
            columns=[
                "source",
                "select_rank",
                "doc_id",
                "rel_micros",
                "max_sim_to_prior_micros",
            ],
        )

    # the sim side renames its key: both cogroup inputs descend from
    # the same checkpoint, and a same-name groupBy trips the
    # ambiguous-self-join analyzer check
    return (
        cand.select("source", "doc_id", "rel")
        .groupBy("source")
        .cogroup(
            sim.select(
                F.col("source").alias("src2"), "da", "db", "s"
            ).groupBy("src2")
        )
        .applyInPandas(picks_group, PICKS_SCHEMA)
    )
