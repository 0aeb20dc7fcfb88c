"""Multimodal binary-column plumbing: schemas, Arrow kernels, frame
sampling, metadata-only pruning (decode itself is a deterministic stub)."""

import numpy as np
import pytest

from lucene_solr_spark.operators.multimodal import (
    FEATURE_DIM, decode_image_stub, extract_features, make_fake_assets,
    media_stats, sample_frames,
)

pytestmark = pytest.mark.spark


def test_feature_extraction_shape_and_determinism(spark):
    assets = make_fake_assets(spark, n=32)
    feats = extract_features(assets).toPandas().sort_values("asset_id")
    assert len(feats) == 32
    assert all(len(f) == FEATURE_DIM for f in feats["feature"])
    # deterministic across runs
    feats2 = extract_features(assets).toPandas().sort_values("asset_id")
    assert [list(x) for x in feats["feature"]] == [
        list(x) for x in feats2["feature"]
    ]
    assert (feats["n_bytes"].values == 256 + np.arange(32)).all()


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image_stub(b"\xff\xd8fakejpegdata", 8, 8)


def test_codec_seam_selects_stub_without_pillow(monkeypatch):
    """In this sandbox (no Pillow) the seam resolves to the stub; with
    LSS_REAL_CODEC=0 it resolves to the stub even if Pillow existed."""
    from lucene_solr_spark.operators.multimodal import (
        get_image_decoder, pillow_image_decoder,
    )

    assert pillow_image_decoder() is None  # sandbox: Pillow absent
    assert get_image_decoder() is decode_image_stub
    monkeypatch.setenv("LSS_REAL_CODEC", "0")
    assert pillow_image_decoder() is None
    assert get_image_decoder() is decode_image_stub


def test_codec_seam_real_decoder_branch(spark):
    """The injected-decoder branch: a fake 'real' decoder flows through
    the same Arrow kernel, proving a Pillow deployment changes no plan
    shape (feature dim, schema, batch handling identical)."""
    import numpy as np

    from lucene_solr_spark.operators.multimodal import (
        FEATURE_DIM, extract_features, make_fake_assets,
    )

    calls = []

    def fake_real(payload, width, height):
        calls.append(1)
        return np.full(int(width) * int(height), 7.0, dtype=np.float32)

    assets = make_fake_assets(spark, n=8)
    feats = extract_features(assets, decoder=fake_real).toPandas()
    assert len(feats) == 8
    assert all(len(f) == FEATURE_DIM for f in feats["feature"])
    assert all(abs(x - 7.0 / 255.0) < 1e-6
               for f in feats["feature"] for x in f)


def test_frame_sampling(spark):
    assets = make_fake_assets(spark, n=30)
    frames = sample_frames(assets, every=5).toPandas()
    vids = assets.filter("kind = 'video'").select(
        "asset_id", "meta.n_frames"
    ).toPandas()
    want = sum((int(n) + 4) // 5 for n in vids["n_frames"])
    assert len(frames) == want
    assert set(frames["asset_id"]) <= set(vids["asset_id"])


def test_metadata_scan_prunes_payload(spark, tmp_path):
    p = str(tmp_path / "assets")
    make_fake_assets(spark, n=12).write.parquet(p)
    assets = spark.read.parquet(p)
    stats = media_stats(assets)
    assert stats.count() == 3  # image/audio/video
    # column pruning: a pure-metadata query must not read the binary
    # payload at all (ReadSchema of the parquet scan excludes it)
    pure = assets.groupBy("kind").count()
    plan = pure._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
