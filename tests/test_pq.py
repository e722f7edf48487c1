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


def test_encode_matches_numpy_twin(spark):
    # round 4: the codebook is sampled k-means, so pin the whole encode
    # against an independent driver-side numpy replication — same codebook,
    # same per-subspace 9-dp rounding, same argmin tie rule
    import numpy as np

    from crawlspark.datapipe.similarity import kmeans_codebook

    df = _emb(spark)
    cb = kmeans_codebook(df, 4)
    got = {r.vec_id: r for r in pq_encode(df, n_centroids=4, n_sub=4).collect()}
    mat = {r.vec_id: np.asarray(r.embedding) for r in df.collect()}
    for vid, x in mat.items():
        codes, err2 = [], 0.0
        for m in range(4):
            xs, cs = x[m * 4:(m + 1) * 4], cb[:, m * 4:(m + 1) * 4]
            d2 = np.round(((xs - cs) ** 2).sum(axis=1), 9)
            c = int(d2.argmin())
            codes.append(c)
            err2 += ((xs - cs[c]) ** 2).sum()
        assert list(got[vid].codes) == codes, vid
        assert abs(got[vid].recon_err - round(float(np.sqrt(err2)), 6)) < 1e-9


def test_kmeans_cells_are_balanced(spark):
    # the round-3 verdict's done-criterion for the codebook change: on the
    # real (id-correlated) embeddings table the k-means cells must not skew —
    # max cell ≤ c × mean cell. The old first-16-rows-by-id convention is the
    # skew this guards against.
    import numpy as np

    from crawlspark.datapipe.similarity import kmeans_codebook

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    cb = kmeans_codebook(emb, 16)
    assert cb.shape == (16, 64)
    mat = np.stack([np.asarray(r.embedding) for r in emb.collect()])
    d2 = np.stack([((mat - cb[c]) ** 2).sum(axis=1) for c in range(16)], axis=1)
    counts = np.bincount(d2.argmin(axis=1), minlength=16)
    assert counts.max() <= 3.0 * counts.mean(), counts.tolist()


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
