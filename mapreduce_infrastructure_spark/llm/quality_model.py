"""Model-based quality scoring: the classifier tier of corpus curation.

Heuristic quality signals (text.quality_scores) are the first filter; the
modern pipeline's second filter is a trained classifier scoring every
document (the fastText/DCLM pattern: label a slice, train a linear model
on cheap features, score the corpus at scan speed). Reproduced here
Spark-natively with MLlib: hashed TF-IDF token features → logistic
regression → distributed scoring. Weak labels come from the corpus itself
(top vs bottom token-count quartile per language — a stand-in for "human
labeled a slice"), so the query is self-contained on the fixture tables.

Scale shape: feature hashing is stateless per-row (no vocabulary build),
IDF and the L-BFGS aggregations are treeAggregate reductions (one pass
per iteration over the training SLICE only), and the model.transform
scoring step itself is a per-row map with a few KB of broadcast
coefficients. The full query is NOT shuffle-free, though: the weak-label
column it emits comes from an exact per-language percent_rank — computed
via the count-value histogram closed form (functions/ranks.py), so the
shuffles are keyed by (lang, token-count), never by the ~20-language key
alone. At 100 TB you would label a bounded sample instead, train there,
and score everything with the pure scan-speed map; this fixture-scale
query keeps the label column on every row so its AUC/calibration tests
can read it.

No SQL oracle: L-BFGS coefficient fitting is not SQL-expressible (the
double reductions are also summation-order sensitive at the last ulp), so
the query is rows-only; tests assert the semantic contract — separation
quality (AUC) on held-out weak labels, score range, determinism of the
RANKING (stable under reruns even if the last ulp of a coefficient is
not), and schema stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.exact import rnd
from ..functions.ranks import hist_percent_rank
from ..registry import query
from .text import tokens_col

_HASH_DIM = 1 << 12  # hashed feature space (no vocabulary build)
_LR_ITERS = 25
_LR_REG = 0.01


@query("quality_classifier_scores", tags=("quality", "model", "llm"))
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a TF-IDF + logistic-regression quality model on weak labels
    (per-language top token-count quartile = positive, bottom = negative,
    quartile edges via exact percent_rank) and score EVERY document,
    returning (doc_id, lang, label_weak, prob rounded to 4). Docs between
    the quartiles carry label_weak = NULL and are scored only — the
    labeled slice is the training set, the rest is inference."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens_col().alias("toks")
    )
    # Weak-label rank via the count-value histogram closed form (see
    # functions/ranks.py): the ranking statistic is the token count —
    # small-domain — so no window ever partitions the volume-scaled doc
    # table by the ~20-language key.
    labeled = (
        hist_percent_rank(
            docs.withColumn("_n_toks", F.size("toks").cast("long")),
            ["lang"],
            "_n_toks",
            "doc_id",
            descending=True,
        )
        .withColumn(
            "label_weak",
            F.when(F.col("pr") <= 0.25, F.lit(1.0))
            .when(F.col("pr") >= 0.75, F.lit(0.0))
            .otherwise(F.lit(None).cast("double")),
        )
        .drop("_n_toks", "n_stratum")
    )
    tf = HashingTF(
        inputCol="toks", outputCol="tf", numFeatures=_HASH_DIM, binary=False
    )
    feat = tf.transform(labeled)
    idf_model = IDF(inputCol="tf", outputCol="features").fit(
        feat.filter(F.col("label_weak").isNotNull())
    )
    scored_input = idf_model.transform(feat)
    train = scored_input.filter(F.col("label_weak").isNotNull()).withColumn(
        "label", F.col("label_weak")
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=_LR_ITERS,
        regParam=_LR_REG,
        standardization=True,
    )
    model = lr.fit(train)
    scored = model.transform(scored_input)
    from pyspark.ml.functions import vector_to_array

    prob_pos = F.element_at(vector_to_array(F.col("probability")), 2).cast("double")
    return scored.select(
        "doc_id",
        "lang",
        F.col("label_weak"),
        rnd(prob_pos, 4).alias("prob"),
    )


@query("quality_model_calibration_bins", tags=("quality", "model", "stats", "llm"))
def quality_model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for `quality_classifier_scores` against its
    weak labels — the model-QA step after training a quality classifier:
    on the LABELED slice, bucket predicted probability into 10 fixed bins
    [0,0.1) … [0.9,1.0] and report per-bin count, mean predicted prob,
    and observed positive share. A well-calibrated scorer has mean_prob ≈
    pos_share per bin; divergence says the score threshold the curation
    pipeline cuts at doesn't mean what it claims. Scale shape: everything
    downstream of the scorer is one 10-row aggregate over the labeled
    slice — the classifier's own cost dominates (see its docstring).

    No SQL oracle, inherited from `quality_classifier_scores` (L-BFGS
    coefficients are not SQL-expressible), so the driver applies its
    rows-only check — but everything OUTSIDE the fit carries a
    pure-python PARTIAL ORACLE (round-16 graduation, tests/
    test_sampling.py::test_quality_calibration_bins_partial_oracle_
    pure_python): the weak-label chain is re-derived from raw parquet
    and matched per-document, and the bins are recomputed from
    (pure-python label, engine prob) with exact counts and pos_share;
    only mean_prob — a cross-order sum of the engine-specific
    probabilities — is pinned to one final-decimal ulp. The older
    contract test additionally asserts the partition/interval/
    consistency invariants.
    """
    scored = quality_classifier_scores(spark, sf_dir).filter(
        F.col("label_weak").isNotNull()
    )
    bin_ = F.least(F.floor(F.col("prob") * 10), F.lit(9)).cast("int")
    return (
        scored.select("label_weak", "prob", bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg("prob"), 4).alias("mean_prob"),
            rnd(F.avg("label_weak"), 4).alias("pos_share"),
        )
    )
