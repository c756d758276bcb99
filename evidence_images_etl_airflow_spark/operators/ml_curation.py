"""MLlib-backed curation operators (SURVEY.md §7 M7 extension):
model-based quality filtering and semantic (embedding-space) dedup.

Two standard LLM-pretraining curation steps the heuristic operators
can't cover:

- **Model-based quality classifier** (the fastText/DSIR-style filter):
  train a sparse text classifier on weak labels (a trusted "good"
  subset vs the rest), then score the whole corpus and keep the
  high-probability tail. HashingTF -> IDF -> LogisticRegression, all
  MLlib estimators: TF/IDF are single-pass distributed aggregates and
  LR trains via L-BFGS with treeAggregate gradients — the driver holds
  one dense coefficient vector (vocab-hash dim), never data. Scoring
  is a broadcast of that vector, embarrassingly parallel.
- **Semantic dedup** (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  k-means the embedding space, then look for near-duplicate pairs ONLY
  within a cluster. KMeans|| init + Lloyd iterations are all
  map-side-combinable distributed aggregates; the within-cluster pair
  join is the same blocked-quadratic shape as the LSH buckets in
  operators/dedup.py — with k scaled ~N/const the per-cluster work
  stays bounded, which is what makes the all-pairs problem tractable
  at 100 TB (SemDeDup's own recipe).

Training is iterative and model state is floating-point, so these are
rows-only queries in the registry (no SQL oracle can express L-BFGS);
the unit tests pin behavior on synthetic separable data instead.
Seeds are fixed everywhere -> runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.text import tokens
from evidence_images_etl_airflow_spark.functions.vectors import cosine


def kmeans_clusters(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Assign each embedding to one of ``k`` k-means clusters ->
    (id, cluster). The clustering backbone for semantic dedup and
    IVF-style partitioning; distributed KMeans|| — no driver-side data
    beyond the k centroid vectors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
    )
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="__features"
    ).fit(feats)
    return model.transform(feats).select(
        id_col, vec_col, F.col("prediction").alias("cluster")
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    threshold: float,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup: (id_a, id_b, sim) pairs with cosine >= ``threshold``,
    searched ONLY within a k-means cluster. Choose k ~ N/target so a
    cluster holds a bounded number of rows: the pair join is then an
    equi-join on the cluster id with per-cluster quadratic cost — the
    same bounded-block pattern as the LSH/pigeonhole dedup operators,
    never a global cross join. Misses cross-cluster near-dups at the
    cluster boundary (SemDeDup's documented recall trade; raise k
    slowly or overlap clusters to tighten it). The cosine itself is the
    deterministic zip_with/aggregate fold from functions/vectors."""
    clustered = kmeans_clusters(embeddings, id_col, vec_col, k, seed=seed)
    a = clustered.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = clustered.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine("__va", "__vb"), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def train_quality_classifier(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    num_features: int = 1 << 18,
    seed: int = 42,
):
    """Fit the model-based quality filter: tokens -> HashingTF ->
    IDF -> LogisticRegression on a weakly-labeled frame (label 1 =
    trusted "good" text). Returns the fitted PipelineModel. The feature
    space is a fixed-size hash (no vocab to collect); at corpus scale
    train on a SAMPLE (the classifier needs ~1e5-1e6 labeled rows, not
    the corpus) and score everything."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF

    tokened = docs.withColumn("__tokens", tokens(F.col(text_col)))
    pipeline = Pipeline(
        stages=[
            HashingTF(
                inputCol="__tokens", outputCol="__tf", numFeatures=num_features
            ),
            IDF(inputCol="__tf", outputCol="__features"),
            LogisticRegression(
                featuresCol="__features",
                labelCol=label_col,
                maxIter=30,
                regParam=1e-3,
            ),
        ]
    )
    return pipeline.fit(tokened)


def score_quality(model, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Score a corpus with a fitted quality classifier -> (id,
    good_prob, keep). Pure map-side work: the coefficient vector
    broadcasts, every row is scored independently."""
    from pyspark.ml.functions import vector_to_array

    tokened = docs.withColumn("__tokens", tokens(F.col(text_col)))
    scored = model.transform(tokened)
    return scored.select(
        id_col,
        F.round(vector_to_array(F.col("probability")).getItem(1), 6).alias(
            "good_prob"
        ),
        F.col("prediction").cast("int").alias("keep"),
    )
