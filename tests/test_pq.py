"""Product-quantization semantics (similarity.pq_encode / pq_adc_topk)."""

from pyspark.sql import functions as F

from crawlspark.datapipe.similarity import pq_adc_topk, pq_encode


def _emb(spark, n=32, dim=16):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_shape_and_range(spark):
    df = _emb(spark)
    out = pq_encode(df, n_centroids=4, n_sub=4).collect()
    assert len(out) == 32
    for r in out:
        assert len(r.codes) == 4
        assert all(0 <= c < 4 for c in r.codes)
        assert r.recon_err >= 0.0


def test_centroid_vectors_encode_exactly(spark):
    # the codebook IS the 4 lowest-id vectors — each must encode to itself
    # per subspace with zero reconstruction error
    df = _emb(spark)
    out = {r.vec_id: r for r in pq_encode(df, n_centroids=4, n_sub=4).collect()}
    for vid in range(4):
        assert out[vid].recon_err == 0.0


def test_more_centroids_never_hurt_reconstruction(spark):
    df = _emb(spark)
    e4 = {r.vec_id: r.recon_err for r in pq_encode(df, n_centroids=4, n_sub=4).collect()}
    e16 = {r.vec_id: r.recon_err for r in pq_encode(df, n_centroids=16, n_sub=4).collect()}
    assert all(e16[v] <= e4[v] + 1e-9 for v in e4)


def test_adc_topk_exact_when_uncompressed(spark):
    # with n_centroids == corpus size every vector is its own centroid per
    # subspace → ADC distance equals the true squared L2 distance, so the
    # top-k must match a brute-force exact ranking
    import numpy as np

    df = _emb(spark, n=16)
    q = df.filter(F.col("vec_id") < 2)
    got = {
        (r.query_id, r.rk): (r.nbr_id, r.adc_dist)
        for r in pq_adc_topk(df, q, k=3, n_centroids=16, n_sub=4).collect()
    }
    mat = np.array([r.embedding for r in df.orderBy("vec_id").collect()])
    for qid in range(2):
        d = np.round(((mat - mat[qid]) ** 2).sum(axis=1), 6)
        order = sorted((float(d[i]), i) for i in range(16) if i != qid)[:3]
        for rk, (dist, nbr) in enumerate(order, start=1):
            assert got[(qid, rk)][0] == nbr
            assert abs(got[(qid, rk)][1] - dist) < 1e-6
