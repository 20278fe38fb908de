"""Product quantization (similarity.pq_*): numpy reference parity
and the identities that make ADC search trustworthy."""

from __future__ import annotations

import numpy as np

from reddit_hn_etl_spark.operators import similarity
from reddit_hn_etl_spark.sources.tables import read_table

CB = similarity.pq_codebooks(dim=64, n_sub=8, k=16, seed=101)
SUB = 8


def _np_encode(x: np.ndarray):
    codes = np.zeros((len(x), 8), dtype=int)
    err = np.zeros(len(x))
    for s in range(8):
        c = np.array(CB[s])
        d = ((x[:, None, s * SUB:(s + 1) * SUB] - c[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)
        err += d.min(axis=1)
    return codes, err


def test_pq_encode_matches_numpy(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    codes, err = _np_encode(x)
    got = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in similarity.pq_encode(emb, CB).collect()
    }
    for i, r in enumerate(rows):
        gc, ge = got[r["vec_id"]]
        assert gc == list(codes[i])
        assert abs(ge - err[i]) <= 1e-9


def test_pq_adc_matches_numpy_and_bounds(spark, sf_dir):
    """ADC estimate equals the numpy LUT sum, and for a vector that
    IS its own reconstruction the estimate equals the true distance
    exactly (the identity that anchors the approximation)."""
    q = [0.01 * ((i % 7) - 3) for i in range(64)]
    emb = read_table(spark, sf_dir, "embeddings").limit(100)
    enc = similarity.pq_encode(emb, CB)
    got = {
        r["vec_id"]: r["est_dist"]
        for r in similarity.pq_adc_scores(enc, CB, q).collect()
    }
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    codes, _ = _np_encode(x)
    qv = np.array(q)
    for i, r in enumerate(rows):
        est = sum(
            ((qv[s * SUB:(s + 1) * SUB] - np.array(CB[s][codes[i, s]])) ** 2).sum()
            for s in range(8)
        )
        assert abs(got[r["vec_id"]] - est) <= 1e-9

    # reconstruction identity: encode a vector equal to codewords
    recon = [v for s in range(8) for v in CB[s][3]]
    df = spark.createDataFrame(
        [(0, [float(v) for v in recon])], "vec_id long, embedding array<float>"
    )
    enc0 = similarity.pq_encode(df, CB)
    row = enc0.first()
    # float32 storage rounds the codeword coords; error is ~1e-15
    assert row["recon_err"] <= 1e-12
    assert list(row["codes"]) == [3] * 8
    est0 = similarity.pq_adc_scores(enc0, CB, q).first()["est_dist"]
    true0 = ((qv - np.array(recon)) ** 2).sum()
    assert abs(est0 - true0) <= 1e-6
