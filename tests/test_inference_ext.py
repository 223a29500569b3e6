"""Independent checks for the round-8 inference batch: ANOVA and
Kruskal-Wallis against a from-scratch pandas/numpy computation (the
DuckDB oracle already gates value equality — this pins the STATISTIC
itself against a third implementation), the Naive Bayes invariants,
and the q_dpp_join plan's dynamicpruning expression."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.inference_ext import (
    q_anova_oneway,
    q_dpp_join,
    q_kruskal_wallis,
    q_naive_bayes_train,
)
from tests.conftest import SF_DIR


def _cents_by_group(spark):
    pdf = (load_table(spark, SF_DIR, "orders")
           .select("o_orderpriority", "o_totalprice").toPandas())
    pdf["c"] = (pdf["o_totalprice"] * 100).round().astype("int64")
    return pdf


def test_anova_matches_numpy(spark):
    pdf = _cents_by_group(spark)
    groups = [g["c"].to_numpy(dtype=float)
              for _, g in pdf.groupby("o_orderpriority")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    mean = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - mean) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_want = (ssb / (k - 1)) / (ssw / (n - k))
    row = q_anova_oneway(spark, SF_DIR).first()
    assert row.k == k and row.n == n
    assert math.isclose(row.f_stat, f_want, rel_tol=1e-6), (row.f_stat, f_want)
    assert math.isclose(row.ssb_dollars2, ssb / 1e4, rel_tol=1e-6)
    assert math.isclose(row.ssw_dollars2, ssw / 1e4, rel_tol=1e-6)


def test_kruskal_wallis_matches_pandas_ranks(spark):
    pdf = _cents_by_group(spark)
    pdf["rank"] = pdf["c"].rank(method="average")
    n = len(pdf)
    h = (12.0 / (n * (n + 1))
         * sum(g["rank"].sum() ** 2 / len(g)
               for _, g in pdf.groupby("o_orderpriority"))
         - 3.0 * (n + 1))
    _, t_counts = np.unique(pdf["c"].to_numpy(), return_counts=True)
    tie = 1.0 - (t_counts.astype(float) ** 3 - t_counts).sum() / (n**3 - n)
    h_want = h / tie
    row = q_kruskal_wallis(spark, SF_DIR).first()
    assert row.n == n
    assert math.isclose(row.h_stat, h_want, rel_tol=1e-6), (row.h_stat, h_want)


def test_naive_bayes_invariants(spark):
    out = q_naive_bayes_train(spark, SF_DIR).toPandas()
    # top-k is per class, ranked by count desc with token tiebreak
    for _, g in out.groupby("lang"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["token_count"].diff().dropna() <= 0).all()
        # smoothed log-likelihood is monotone in the count
        assert (g["log_likelihood"].diff().dropna() <= 1e-9).all()
    # class priors: one value per class, exp-sums to 1 over ALL classes
    priors = out.groupby("lang")["log_prior"].first()
    assert abs(np.exp(priors).sum() - 1.0) < 1e-4
    # likelihoods are genuine log-probabilities
    assert (out["log_likelihood"] < 0).all()


def test_dpp_join_plan_has_dynamic_pruning(spark):
    df = q_dpp_join(spark, SF_DIR)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("dynamicpruning" in ln for ln in pf), plan[:2000]
    # and the dim side must be a broadcast (reused for the pruning
    # subquery — the free-DPP shape)
    assert "BroadcastExchange" in plan


def test_dpp_join_matches_unpartitioned_semantics(spark):
    got = {r.event_type: (r.n_events, round(r.sum_value, 2))
           for r in q_dpp_join(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events") \
        .withColumn("cents", F.round(F.col("value") * 100).cast("bigint"))
    agg = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
           .collect())
    want = {r.event_type: (r.n, round(r.cents / 100.0, 2))
            for r in agg if r.cents * 1.0 / r.n >= 50.0 * 100}
    assert got == want


def test_logreg_irls_matches_numpy(spark):
    from my_mapreduce_spark.queries.inference_ext import q_logreg_irls

    c = load_table(spark, SF_DIR, "customer") \
        .select("c_custkey", "c_mktsegment", "c_acctbal").toPandas()
    o = load_table(spark, SF_DIR, "orders") \
        .select("o_custkey").drop_duplicates().toPandas()
    c["y"] = c["c_custkey"].isin(set(o["o_custkey"])).astype(float)
    c["x"] = (c["c_acctbal"] * 100).round() / 100.0

    got = {r.segment: r for r in q_logreg_irls(spark, SF_DIR).collect()}
    for seg, g in c.groupby("c_mktsegment"):
        X = np.column_stack([np.ones(len(g)), g["x"].to_numpy()])
        y = g["y"].to_numpy()
        beta = np.zeros(2)
        for _ in range(2):
            p = 1.0 / (1.0 + np.exp(-X @ beta))
            W = p * (1 - p)
            beta = beta + np.linalg.solve((X * W[:, None]).T @ X,
                                          X.T @ (y - p))
        row = got[seg]
        assert row.n == len(g) and row.n_pos == int(y.sum())
        assert math.isclose(row.beta0, beta[0], rel_tol=1e-5, abs_tol=1e-6)
        assert math.isclose(row.beta1, beta[1], rel_tol=1e-5, abs_tol=1e-6)


def test_poisson_glm_matches_numpy(spark):
    from my_mapreduce_spark.queries.inference_ext import q_poisson_glm

    c = load_table(spark, SF_DIR, "customer") \
        .select("c_custkey", "c_mktsegment", "c_acctbal").toPandas()
    o = load_table(spark, SF_DIR, "orders") \
        .select("o_custkey").toPandas()
    counts = o["o_custkey"].value_counts()
    c["y"] = c["c_custkey"].map(counts).fillna(0).astype(float)
    c["x"] = (c["c_acctbal"] * 100).round() / 100.0

    got = {r.segment: r for r in q_poisson_glm(spark, SF_DIR).collect()}
    for seg, g in c.groupby("c_mktsegment"):
        X = np.column_stack([np.ones(len(g)), g["x"].to_numpy()])
        y = g["y"].to_numpy()
        beta = np.zeros(2)
        for _ in range(2):
            lam = np.exp(X @ beta)
            beta = beta + np.linalg.solve((X * lam[:, None]).T @ X,
                                          X.T @ (y - lam))
        row = got[seg]
        assert row.n == len(g) and row.total_orders == int(y.sum())
        assert math.isclose(row.beta0, beta[0], rel_tol=1e-5, abs_tol=1e-6)
        assert math.isclose(row.beta1, beta[1], rel_tol=1e-5, abs_tol=1e-6)
