"""Image codec invariants (BASELINE.json input_hint): lossless exact decode,
lossy PSNR ≥ 40 dB, caption equality through the Spark pipeline."""

import numpy as np

from crawlspark import image as IMG
from crawlspark import synth


def test_roundtrip_lossless_exact():
    px = IMG.reference_pixels("img00000001", 32, 16)
    for fmt in ("ppm", "bmp", "png"):
        data = IMG.ENCODERS[fmt](px)
        out = IMG.DECODERS[fmt](data)
        assert np.array_equal(out, px), fmt


def test_qnt_psnr_above_40():
    px = IMG.reference_pixels("img00000002", 64, 64)
    out = IMG.decode_qnt(IMG.encode_qnt(px))
    p = IMG.psnr_db(out, px)
    assert p >= 40.0, p
    assert p < 60.0  # genuinely lossy — not accidentally exact


def test_bmp_row_padding():
    # odd width → rows padded to 4 bytes; must still roundtrip exactly
    px = IMG.reference_pixels("img00000003", 17, 5)
    assert np.array_equal(IMG.decode_bmp(IMG.encode_bmp(px)), px)


def test_average_hash_stable_and_discriminative():
    a = IMG.average_hash(IMG.reference_pixels("imgA", 32, 32))
    b = IMG.average_hash(IMG.reference_pixels("imgB", 32, 32))
    assert a == IMG.average_hash(IMG.reference_pixels("imgA", 32, 32))
    assert a != b
    assert -(1 << 63) <= a < (1 << 63)


def test_validate_udf_over_images_table(spark):
    world = synth.make_world(n_hosts=4, total_pages=60)
    df = synth.images_df(spark, world)
    from pyspark.sql import functions as F

    checked = df.withColumn(
        "v", IMG.validate_image_udf(F.col("image_id"), F.col("bytes"), F.col("fmt"))
    ).select(
        "image_id",
        "fmt",
        "caption",
        "phash",
        F.col("v.psnr_db").alias("psnr_db"),
        F.col("v.pixels_ok").alias("pixels_ok"),
        F.col("v.phash").alias("phash2"),
    )
    rows = checked.collect()
    assert len(rows) == len(world.images)
    for r in rows:
        assert r.pixels_ok, (r.image_id, r.fmt, r.psnr_db)
        if r.fmt in ("ppm", "bmp", "png"):
            assert r.psnr_db == 1e9
        else:
            assert r.psnr_db >= 40.0
    # phash recomputed from decoded payload equals the stored table phash
    # (qnt is quantized but average-hash is robust to ±2/255 noise here)
    mismatches = [r for r in rows if r.phash2 != r.phash]
    assert not mismatches, mismatches[:3]


def test_corrupt_bytes_flagged_not_crashing(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("bad", b"not an image", "png")], "image_id string, bytes binary, fmt string"
    )
    r = df.select(IMG.validate_image_udf("image_id", "bytes", "fmt").alias("v")).collect()[0]
    assert r.v.pixels_ok is False
