"""Multimodal stages: schema plumbing, determinism, real transforms over
the stubbed codec."""

import numpy as np
import pytest

from pdf_parser_ray.ops.multimodal import (
    DecodeImage,
    ResizeImage,
    SampleFrames,
    _fake_decode_image,
    audio_features,
    image_features,
    image_pipeline,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(synth_media_table(30, seed=7))


class TestFakeDecode:
    def test_deterministic_and_shaped(self):
        a = _fake_decode_image(b"abcdef", 4, 3)
        b = _fake_decode_image(b"abcdef", 4, 3)
        assert a.shape == (3, 4, 3) and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)

    def test_empty_payload(self):
        assert _fake_decode_image(b"", 2, 2).shape == (2, 2, 3)


class TestStages:
    def test_decode_stage(self, media_ds):
        import pyarrow.compute as pc

        imgs = media_ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), "image")),
            batch_format="pyarrow",
        )
        out = imgs.map_batches(DecodeImage, batch_format="pyarrow",
                               batch_size=4, concurrency=2).take_all()
        assert out
        for r in out:
            assert len(r["pixels"]) == r["width"] * r["height"] * 3
            assert r["decoder"] in ("pil", "fake")

    def test_resize_nearest(self):
        import pyarrow as pa

        arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "pixels": pa.array([arr.tobytes()], pa.binary()),
                "width": pa.array([6], pa.int32()),
                "height": pa.array([4], pa.int32()),
            }
        )
        out = ResizeImage(out_w=3, out_h=2)(batch)
        pix = np.frombuffer(out.column("pixels")[0].as_py(), dtype=np.uint8)
        got = pix.reshape(2, 3, 3)
        np.testing.assert_array_equal(got, arr[[0, 2]][:, [0, 2, 4], :])

    def test_image_features_shape(self):
        import pyarrow as pa

        arr = np.full((4, 4, 3), 128, dtype=np.uint8)
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "pixels": pa.array([arr.tobytes()], pa.binary()),
                "width": pa.array([4], pa.int32()),
                "height": pa.array([4], pa.int32()),
            }
        )
        feats = image_features(batch).column("features")[0].as_py()
        assert len(feats) == 3 + 3 + 8
        assert feats[0] == 128.0 and feats[3] == 0.0  # mean / std
        assert sum(feats[6:]) == pytest.approx(1.0)

    def test_sample_frames(self, media_ds):
        import pyarrow.compute as pc

        vids = media_ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), "video")),
            batch_format="pyarrow",
        )
        rows = vids.map_batches(SampleFrames, fn_constructor_kwargs={"stride": 2},
                                batch_format="pyarrow", batch_size=4,
                                concurrency=2).take_all()
        assert rows
        vid_meta = {r["media_id"]: r["n_frames"] for r in
                    media_ds.take_all() if r["kind"] == "video"}
        by_media = {}
        for r in rows:
            by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
        for mid, idxs in by_media.items():
            assert idxs == list(range(0, vid_meta[mid], 2))
            # every frame slice has the same size
        sizes = {len(r["payload"]) for r in rows if r["media_id"] == rows[0]["media_id"]}
        assert len(sizes) == 1

    def test_audio_features(self, media_ds):
        import pyarrow.compute as pc

        auds = media_ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), "audio")),
            batch_format="pyarrow",
        )
        out = auds.map_batches(audio_features, batch_format="pyarrow").take_all()
        assert out
        for r in out:
            assert r["rms"] >= 0 and 0 <= r["zcr"] <= 1

    def test_image_pipeline_end_to_end(self, media_ds):
        out = image_pipeline(media_ds, out_size=(4, 4)).take_all()
        assert out and all(len(r["features"]) == 14 for r in out)

    def test_pipeline_deterministic(self, media_ds):
        a = sorted((r["media_id"], tuple(r["features"]))
                   for r in image_pipeline(media_ds).take_all())
        b = sorted((r["media_id"], tuple(r["features"]))
                   for r in image_pipeline(media_ds).take_all())
        assert a == b


class TestPerceptualHash:
    def test_identical_payloads_same_hash_distinct_differ(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.multimodal import (
            image_phash_groups,
            synth_media_table,
        )

        media = ray.data.from_arrow(synth_media_table(90, dup_every=45))
        out = image_phash_groups(media).to_pandas()
        # rows i and i+45 are byte-identical -> every image hash has >= 2
        # members; structured (tiled) fakes may collide further but at
        # least one group must exist and all groups have >= 2 members
        assert len(out) >= 1
        assert (out["n_images"] >= 2).all()

    def test_dhash_is_gradient_sign_pattern(self, ray_session):
        import numpy as np

        from pdf_parser_ray.ops.multimodal import _dhash64

        inc = np.tile(np.arange(9, dtype=np.float64), (8, 1))
        dec = inc[:, ::-1].copy()
        assert _dhash64(inc) == 0xFFFFFFFFFFFFFFFF  # all rising
        assert _dhash64(dec) == 0                   # all falling


class TestAudioFingerprint:
    def test_identical_clips_group_and_gain_invariance(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.multimodal import (
            _audio_fingerprint64,
            audio_fingerprint_groups,
            synth_media_table,
        )

        media = ray.data.from_arrow(synth_media_table(90, dup_every=45))
        out = audio_fingerprint_groups(media).to_pandas()
        assert len(out) >= 1
        assert (out["n_clips"] >= 2).all()
        # gain invariance: doubling amplitude preserves the bit pattern
        rng = np.random.RandomState(5)
        wave = (rng.randn(13000) * 3000).astype("<i2")
        assert _audio_fingerprint64(wave) == _audio_fingerprint64(
            (wave.astype(np.int32) * 2).clip(-32768, 32767).astype("<i2")
        )

    def test_fingerprint_is_energy_trend_pattern(self, ray_session):
        import numpy as np

        from pdf_parser_ray.ops.multimodal import _audio_fingerprint64

        # strictly rising energy staircase -> all 64 bits set
        frames = [np.full(100, 10 * (i + 1), dtype=np.float64)
                  for i in range(65)]
        rising = np.concatenate(frames)
        assert _audio_fingerprint64(rising) == 0xFFFFFFFFFFFFFFFF
        assert _audio_fingerprint64(rising[::-1].copy()) == 0


class TestSceneChanges:
    def test_detects_planted_cut(self, ray_session):
        import pyarrow as pa
        import ray.data

        from pdf_parser_ray.ops.multimodal import scene_changes

        fb = 32
        # video 1: cut at frame 3 (dark->bright); video 2: flat
        t = pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "kind": pa.array(["video", "video"]),
                "payload": pa.array(
                    [b"\x28" * (3 * fb) + b"\xc8" * (5 * fb), b"\x50" * (8 * fb)],
                    pa.binary(),
                ),
                "width": pa.array([0, 0], pa.int32()),
                "height": pa.array([0, 0], pa.int32()),
                "n_samples": pa.array([0, 0], pa.int32()),
                "n_frames": pa.array([8, 8], pa.int32()),
            }
        )
        out = scene_changes(ray.data.from_arrow(t)).to_pandas()
        assert out["media_id"].tolist() == [1]
        assert out["frame_idx"].tolist() == [3]
        assert abs(out["delta"].iloc[0] - 160.0) < 1e-9
