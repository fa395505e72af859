"""Train/eval contamination detection — benchmark leakage scanning.

A training-corpus pipeline must verify that held-out evaluation documents do
not leak into the training set (the decontamination step of large-LM data
pipelines: an eval document counts as contaminated when a high fraction of
its word n-grams appears verbatim in some training document). The metric is
*containment* — |grams(train) ∩ grams(eval)| / |grams(eval)| — not Jaccard:
a short eval doc embedded in a long train doc has tiny Jaccard but 100%
containment, and that is exactly the leak case.

Scale design (100 TB corpus, benchmark-sized eval set):
- grams are row-local Catalyst array expressions (no Python);
- the eval-side inverted index is BROADCAST — eval sets are benchmark-sized
  by construction (thousands of docs), so the TB-scale train side streams
  through one map-side join and never shuffles on the gram key;
- train-side grams with document frequency above ``df_cap`` are dropped
  from CANDIDATE GENERATION only (containment is still computed over the
  full gram sets): a corpus stop-gram shared by millions of train docs
  multiplies every eval doc by those millions — and a pair whose only
  shared grams are corpus cliches is not contamination;
- containment verification joins candidates back to the two (small) gram
  sets — candidate volume is bounded by |eval grams| x df_cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine_spark.datapipe import fragments as FR

#: word-n-gram order for overlap. Real pipelines use 8-13-gram character or
#: word windows; the synthetic docs are a few dozen tokens, so 3-grams give
#: the same discrimination the long grams give at document scale.
DECON_K = 3
#: containment above this marks the eval doc contaminated by that train doc.
DECON_T = 0.5
#: train-side grams in more docs than this are excluded from candidate
#: generation (non-discriminative; unbounded fan-out otherwise).
DECON_DF_CAP = 128
#: content-hash eval split (reproducible across engines/cluster sizes —
#: the same sampling primitive as datapipe.sampling.train_eval_split).
DECON_EVAL_RATE = 0.25
DECON_SALT = "split"


def contamination_pairs(
    train_sh: DataFrame,
    eval_sh: DataFrame,
    threshold: float = DECON_T,
    df_cap: int = DECON_DF_CAP,
) -> DataFrame:
    """(train doc, eval doc, containment) pairs with containment ≥ threshold.

    Inputs are ``(doc_id, sh)`` frames of distinct word-n-gram arrays (build
    with ``fragments.shingles``). Output: ``(train_id, eval_id,
    containment)`` where containment = |sh_train ∩ sh_eval| / |sh_eval|.
    """
    inv_e = eval_sh.select("doc_id", F.explode("sh").alias("g"))
    # df-cap without shuffling the TB-scale train side on the gram key:
    # document frequency is only needed for grams that appear in some eval
    # doc (others can never generate candidates), so first prune the train
    # inverted index map-side against the broadcast eval gram set — the
    # semi join keeps ALL train rows of a surviving gram, so the df counted
    # after it equals the full-corpus df for exactly the grams that matter.
    # groupBy().count() is a combine-enabled partial aggregate (shuffle
    # volume <= partitions x |eval grams|), vs the previous
    # Window.partitionBy(g) which shuffled every train gram row.
    eval_grams = inv_e.select("g").distinct()
    inv_t = train_sh.select("doc_id", F.explode("sh").alias("g")).join(
        F.broadcast(eval_grams), "g", "semi"
    )
    ok_grams = inv_t.groupBy("g").count().filter(F.col("count") <= df_cap).drop(
        "count"
    )
    inv_t = inv_t.join(F.broadcast(ok_grams), "g", "semi")
    cand = (
        inv_t.alias("t")
        .join(F.broadcast(inv_e.alias("e")), "g")
        .select(
            F.col("t.doc_id").alias("train_id"), F.col("e.doc_id").alias("eval_id")
        )
        .distinct()
    )
    return (
        cand.join(
            train_sh.withColumnsRenamed({"doc_id": "train_id", "sh": "sh_t"}),
            "train_id",
        )
        .join(
            F.broadcast(
                eval_sh.withColumnsRenamed({"doc_id": "eval_id", "sh": "sh_e"})
            ),
            "eval_id",
        )
        .withColumn("containment", F.expr(FR.containment(FR.Dialect("spark"), "sh_t", "sh_e")))
        .filter(F.col("containment") >= threshold)
        .select("train_id", "eval_id", "containment")
    )
