"""Policy-plugin surface (reference P13) + multimodal plumbing tests."""

import os

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines import multimodal
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.stages.policy import load_policy


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pol_fixture"))
    fixtures.write_fixture(root, n_rows=100, n_events=400, n_epochs=2, seed=77,
                           schema_change_frac=0.0)
    return root


def test_load_policy_dynamic():
    p = load_policy("marc_data_migration_ray.plugins.sample_policy")
    assert p.column_moves() == {"candidate_key": "candidate_key_local"}


def test_policy_applied_in_read_state(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(
        num_partitions=4,
        policy_plugins=("marc_data_migration_ray.plugins.sample_policy",),
    )
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    rows = rp.read_state().take_all()
    names = set(rows[0].keys())
    assert "local_note" in names          # P8-analog execute_batch
    assert "online" in names              # M10-analog route flag
    assert "candidate_key_local" in names  # U7-analog column move
    assert "candidate_key" not in names
    for r in rows:
        assert r["online"] == (r["source"] in ("web", "wiki") if r["source"] else False)
        if r["status"] == "local":
            assert r["local_note"] == "local"


def test_media_decode_pipeline(ray_session):
    out = multimodal.decode_pipeline(n_rows=64).take_all()
    assert len(out) == 64
    assert all(len(r["features"]) == multimodal.MediaDecoder.FEATURE_DIM for r in out)
    # deterministic: same content → same features
    out2 = multimodal.decode_pipeline(n_rows=64).take_all()
    a = sorted(out, key=lambda r: r["media_id"])
    b = sorted(out2, key=lambda r: r["media_id"])
    assert all(list(x["features"]) == list(y["features"]) for x, y in zip(a, b))


def test_media_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.MediaDecoder(decoder="real")


def test_frame_sampler(ray_session):
    out = multimodal.frame_sample_pipeline(n_rows=64).take_all()
    assert len(out) >= 64  # videos expand to ≥1 frame rows
    vids = [r for r in out if r["kind"] == "video"]
    assert vids and all(r["frame_ms"] % 10000 == 0 for r in vids)


# ----------------------------- real container codecs (PPM / WAV / Y4M) --


def test_ppm_roundtrip_and_comments():
    from marc_data_migration_ray.functions import media as M
    import numpy as np

    rgb = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(rgb)), rgb)
    # comment-tolerant header parse (Netpbm spec allows # comments)
    commented = b"P6\n# a comment\n5 4\n255\n" + rgb.tobytes()
    assert np.array_equal(M.decode_ppm(commented), rgb)


def test_ppm_resize_nearest():
    from marc_data_migration_ray.functions import media as M
    import numpy as np

    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[2:, 2:] = 255  # bottom-right quadrant white
    small = M.resize_nearest(rgb, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 255
    big = M.resize_nearest(rgb, 8, 8)
    assert big.shape == (8, 8, 3) and big[7, 7, 0] == 255 and big[0, 0, 0] == 0


def test_wav_roundtrip():
    from marc_data_migration_ray.functions import media as M
    import numpy as np

    s = (np.arange(300, dtype=np.int64) * 37 % 2048 - 1024).astype(np.int16)
    got, rate = M.decode_wav(M.encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(got, s)


def test_y4m_roundtrip_and_strided_seek():
    from marc_data_migration_ray.functions import media as M
    import numpy as np

    frames = np.stack(
        [np.full((6, 8), f * 10, np.uint8) for f in range(5)]
    )
    payload = M.encode_y4m(frames)
    got, w, h, n = M.decode_y4m(payload)
    assert (w, h, n) == (8, 6, 5) and np.array_equal(got, frames)
    # every=2 must SEEK to frames 0, 2, 4 without misaligning the stride
    sampled, _, _, n2 = M.decode_y4m(payload, every=2)
    assert n2 == 5 and np.array_equal(sampled, frames[::2])


def test_real_media_decoder_parses_all_kinds(ray_session):
    """Actor-pool real decode over synthesized PPM/WAV/Y4M payloads matches
    a direct scalar parse of the same payloads."""
    import numpy as np

    from marc_data_migration_ray.functions import media as M

    ids = np.arange(12, dtype=np.int64)
    t = multimodal.synthesize_real_media(ids)
    out = multimodal.RealMediaDecoder()(t).to_pylist()
    for r in out:
        i = r["media_id"]
        if r["kind"] == "image":
            rgb = M.decode_ppm(M.gen_image(i)).reshape(-1, 3).astype(np.int64)
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(rgb.sum(axis=0))
            assert r["n_frames"] is None
        elif r["kind"] == "audio":
            s, rate = M.decode_wav(M.gen_audio(i))
            assert r["n_samples"] == len(s) == M.wav_n_samples(i)
            assert r["sum_sq"] == int((s.astype(np.int64) ** 2).sum())
            assert r["width"] is None
        else:
            assert r["n_frames"] == M.vid_n_frames(i)
            assert r["sum_sq"] is None


def test_png_roundtrip_all_filters():
    """Every PNG filter type (0-4) must survive an encode→decode round
    trip, individually and mixed per row."""
    import numpy as np
    from marc_data_migration_ray.functions import media as M

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (9, 5, 3)).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(
            M.decode_png(M.encode_png(rgb, filter_of_row=lambda y: ft)), rgb
        )
    assert np.array_equal(
        M.decode_png(M.encode_png(rgb, filter_of_row=lambda y: (y * 3 + 1) % 5)),
        rgb,
    )


def test_png_crc_verification_rejects_corruption():
    import pytest
    from marc_data_migration_ray.functions import media as M

    payload = bytearray(M.gen_png(42))
    payload[40] ^= 0xFF  # flip a byte inside the IDAT chunk
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(payload))
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"GIF89a" + bytes(payload))


def test_png_generator_matches_arithmetic():
    """gen_png pixels must equal the oracle arithmetic the SQL mirrors."""
    import numpy as np
    from marc_data_migration_ray.functions import media as M

    for mid in (0, 3, 11, 257):
        rgb = M.decode_png(M.gen_png(mid)).astype(np.int64)
        k = np.arange(M.IMG_W * M.IMG_H * 3, dtype=np.int64)
        expect = ((mid * 19 + 5 * k) % 256).reshape(M.IMG_H, M.IMG_W, 3)
        assert np.array_equal(rgb, expect)


def test_png_decode_pipeline(ray_session):
    from marc_data_migration_ray.pipelines import multimodal

    rows = multimodal.media_png_decode("/root/testdata/sf0.001").take(50)
    from marc_data_migration_ray.functions import media as M

    for r in rows:
        assert r["width"] == M.IMG_W and r["height"] == M.IMG_H
        assert 0 <= r["sum_r"] <= 255 * M.IMG_W * M.IMG_H


def test_jpeg_roundtrip_gradient_within_bound():
    """Baseline JPEG with unit quant tables: arbitrary content (AC path,
    ZRL runs, every DC category) round-trips within the DCT float+round
    error bound of ±2."""
    import numpy as np
    from marc_data_migration_ray.functions import media as M

    rng = np.random.default_rng(13)
    for shape in [(8, 8), (16, 24), (32, 8)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = M.decode_jpeg_gray(M.encode_jpeg_gray(img))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_flat_blocks_bit_exact():
    """Flat 8x8 blocks (the fixture content) decode with zero error —
    the property the SQL oracle relies on."""
    import numpy as np
    from marc_data_migration_ray.functions import media as M

    for mid in [0, 5, 255, 4093]:
        img = M.decode_jpeg_gray(M.gen_jpeg(mid))
        b = np.arange(24, dtype=np.int64)
        want = ((mid * 31 + 17 * b) % 256).reshape(4, 6)
        got = img.reshape(4, 8, 6, 8).transpose(0, 2, 1, 3)
        assert (got == want[:, :, None, None]).all(), mid


def test_jpeg_nondefault_quant_table():
    """The decoder reads DQT from the stream (not assumed): a coarse
    quant table must round-trip through encode/decode consistently
    (lossy, but within q/2 per coefficient → bounded pixel error)."""
    import numpy as np
    from marc_data_migration_ray.functions import media as M

    qz = np.full(64, 4, np.int64)
    img = np.kron(
        np.arange(4, dtype=np.uint8).reshape(2, 2) * 60 + 10,
        np.ones((8, 8), np.uint8),
    )
    out = M.decode_jpeg_gray(M.encode_jpeg_gray(img, qz=qz))
    # flat blocks: only DC survives; DC quant error <= q/2 → pixel err <= q/2
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rejects_malformed():
    import pytest as _pytest

    from marc_data_migration_ray.functions import media as M

    with _pytest.raises(ValueError, match="no SOI"):
        M.decode_jpeg_gray(b"\x00\x01")
    good = M.gen_jpeg(1)
    # corrupt the DHT segment id byte -> tables never load -> SOS raises
    bad = bytearray(good)
    i = good.find(b"\xff\xc4")
    bad[i + 4] = 0x29  # Tc=2 (invalid class), Th=9 (unused slot)
    with _pytest.raises(ValueError):
        M.decode_jpeg_gray(bytes(bad))


def test_jpeg_decode_pipeline(ray_session):
    """Pipeline sums equal the fixture arithmetic for every doc."""
    from marc_data_migration_ray.pipelines import multimodal as mm

    rows = mm.media_jpeg_decode("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    for r in rows[:50]:
        mid = r["media_id"]
        want = sum(64 * ((mid * 31 + 17 * b) % 256) for b in range(24))
        assert (r["width"], r["height"]) == (48, 32)
        assert r["sum_gray"] == want, mid


def test_jpeg_color_roundtrip_and_flat_exactness():
    import numpy as np
    from marc_data_migration_ray.functions import media as M

    # gray flat blocks through the FULL color path: bit-exact
    for mid in [0, 9, 1000]:
        rgb = M.decode_jpeg(M.gen_jpeg_color(mid))
        b = np.arange(24, dtype=np.int64)
        want = ((mid * 23 + 13 * b) % 256).reshape(4, 6)
        blocks = rgb.reshape(4, 8, 6, 8, 3).transpose(0, 2, 1, 3, 4)
        assert (blocks == want[:, :, None, None, None]).all(), mid
    # arbitrary RGB: YCbCr forward+inverse + DCT rounding stays bounded
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    y = M.decode_jpeg(M.encode_jpeg_color(x))
    assert np.abs(y.astype(int) - x.astype(int)).max() <= 4
    # grayscale entry refuses a color stream
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grayscale"):
        M.decode_jpeg_gray(M.gen_jpeg_color(1))


def test_jpeg_color_decode_pipeline(ray_session):
    from marc_data_migration_ray.pipelines import multimodal as mm

    rows = mm.media_jpeg_color_decode("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    for r in rows[:25]:
        mid = r["media_id"]
        want = sum(64 * ((mid * 23 + 13 * b) % 256) for b in range(24))
        assert r["sum_r"] == r["sum_g"] == r["sum_b"] == want, mid


def test_gif_lzw_roundtrip_and_reset():
    """LZW round-trips across the full width ladder, the >4096-entry
    dictionary CLEAR/reset, and the KwKwK (code == next_code) case."""
    import numpy as np

    from marc_data_migration_ray.functions import media as M

    rng = np.random.default_rng(17)
    # incompressible: forces widths 9->12 and a mid-stream reset
    noise = rng.integers(0, 256, 9000, dtype=np.uint8).tobytes()
    assert M._lzw_decode(M._lzw_encode(noise), len(noise)) == noise
    # compressible runs: multi-byte dict strings + the KwKwK case
    runs = b"\x05" * 4000 + bytes(range(256)) * 4 + b"\x09" * 1000
    assert M._lzw_decode(M._lzw_encode(runs), len(runs)) == runs
    # single byte and two-byte edge streams
    for raw in (b"\x00", b"\xff\xff", b"ab"):
        assert M._lzw_decode(M._lzw_encode(raw), len(raw)) == raw


def test_gif_container_roundtrip_and_rejection():
    import numpy as np
    import pytest as _pytest

    from marc_data_migration_ray.functions import media as M

    idx = (np.arange(70 * 70, dtype=np.int64) * 31 % 256).astype(np.uint8)
    pal = M.gif_palette()
    payload = M.encode_gif(idx.reshape(70, 70), pal)
    rgb = M.decode_gif(payload)
    assert np.array_equal(rgb, pal[idx.reshape(70, 70)])
    with _pytest.raises(ValueError, match="not a GIF"):
        M.decode_gif(b"PNG" + payload[3:])
    with _pytest.raises(ValueError):
        M.decode_gif(payload[:40])  # truncated mid-color-table


def test_gif_generator_matches_arithmetic():
    import numpy as np

    from marc_data_migration_ray.functions import media as M

    for mid in (0, 3, 555):
        rgb = M.decode_gif(M.gen_gif(mid)).astype(np.int64)
        k = np.arange(M.GIF_W * M.GIF_H, dtype=np.int64)
        i = ((k * M._GIF_HASH_MULT + mid) >> 13) % 256
        assert rgb.reshape(-1, 3)[:, 0].tolist() == i.tolist()
        assert rgb.reshape(-1, 3)[:, 1].tolist() == ((7 * i + 3) % 256).tolist()
        assert rgb.reshape(-1, 3)[:, 2].tolist() == ((13 * i + 5) % 256).tolist()


def test_gif_decode_pipeline(ray_session):
    from marc_data_migration_ray.pipelines import multimodal as mm

    out = mm.media_gif_decode("/root/testdata/sf0.001").take(5)
    for r in out:
        assert r["width"] == 70 and r["height"] == 70
        assert 0 < r["sum_r"] < 70 * 70 * 256


def test_gif_lzw_hypothesis_roundtrip():
    """Property: every byte stream round-trips through GIF LZW — random
    lengths straddling the width-change boundaries and the 4096 reset,
    plus adversarial run/periodic structures (KwKwK-heavy)."""
    from hypothesis import given, settings, strategies as st

    from marc_data_migration_ray.functions import media as M

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=2000))
    def _case(raw):
        assert M._lzw_decode(M._lzw_encode(raw), len(raw)) == raw

    _case()

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 255), st.integers(1, 40), st.integers(1, 400))
    def _runs(b, period, reps):
        raw = (bytes(range(b, min(b + period, 256))) * reps)[:8000]
        assert M._lzw_decode(M._lzw_encode(raw), len(raw)) == raw

    _runs()
