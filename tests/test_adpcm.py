"""IMA/DVI ADPCM codec (functions/media): the state machine is verified
bit-exactly against the INDEPENDENT stdlib implementation
(``audioop.adpcm2lin`` — Intel/DVI ADPCM with the same public tables),
the container round-trips, and the encoder's quantization error is
bounded by the adaptive step size. The SQL-exact decode oracle is
covered by test_queries_vs_duckdb[media_adpcm_decode].
"""

import warnings

import numpy as np
import pytest

from marc_data_migration_ray.functions import media as M

with warnings.catch_warnings():
    warnings.simplefilter("ignore")  # audioop is deprecated in 3.11
    import audioop


def _pack_high_first(nibbles):
    return bytes(
        ((nibbles[i] & 0xF) << 4) | (nibbles[i + 1] & 0xF)
        for i in range(0, len(nibbles), 2)
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_state_machine_matches_audioop(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        n = int(rng.integers(2, 300)) * 2
        nibbles = [int(x) for x in rng.integers(0, 16, n)]
        pred0 = int(rng.integers(-32768, 32768))
        idx0 = int(rng.integers(0, 89))
        mine = M._ima_decode_nibbles(nibbles, pred0, idx0)
        pcm, _ = audioop.adpcm2lin(_pack_high_first(nibbles), 2, (pred0, idx0))
        theirs = np.frombuffer(pcm, np.int16).tolist()
        assert mine == theirs


def test_container_roundtrip_and_truncation():
    for mid in (0, 3, 88, 89, 254):
        payload = M.gen_adpcm(mid)
        s, rate = M.decode_adpcm(payload)
        assert rate == M.WAV_RATE
        assert len(s) == 1 + M.adpcm_n_nibbles(mid)
        assert int(s[0]) == ((mid * 97) % 65536) - 32768
    # odd sample count: encoder pads a nibble, fact truncates on decode
    sig = np.array([100, 250, -300, 7000, -12000], np.int16)  # 5 samples
    dec, rate = M.decode_adpcm(M.encode_adpcm(sig, 8000, index0=10))
    assert len(dec) == 5 and rate == 8000
    assert int(dec[0]) == 100  # header predictor IS sample 0


def test_encoder_error_bounded_by_step():
    t = np.arange(800)
    sig = (4000 * np.sin(t / 11) + 700 * np.sin(t / 3)).astype(np.int16)
    dec, _ = M.decode_adpcm(M.encode_adpcm(sig, 8000, index0=32))
    err = np.abs(dec.astype(int)[: len(sig)] - sig.astype(int))
    # ADPCM quantization noise: well under the largest step the adaptive
    # index can reach while tracking this bandwidth
    assert err.max() < 1500 and err.mean() < 100


def test_decode_error_paths():
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_adpcm(b"nope")
    pcm_wav = M.encode_wav(np.zeros(8, np.int16), 8000)
    with pytest.raises(ValueError, match="fmt tag"):
        M.decode_adpcm(pcm_wav)  # tag 1 (PCM), not 17
    bad = bytearray(M.gen_adpcm(5))
    # corrupt the block-header step index (first data byte + 2)
    di = bad.find(b"data") + 8
    bad[di + 2] = 200
    with pytest.raises(ValueError, match="step index"):
        M.decode_adpcm(bytes(bad))
