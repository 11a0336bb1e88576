"""From-scratch WAV codec (functions/wav.py) + audio featurizer stage."""

import struct

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.functions.wav import decode_wav, encode_wav


@pytest.mark.parametrize("bits,tol", [(8, 1 / 128), (16, 1 / 32768), (32, 1e-9)])
@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(bits, tol, ch):
    rng = np.random.default_rng(bits + ch)
    x = rng.uniform(-0.9, 0.9, (1000, ch))
    back, rate = decode_wav(encode_wav(x, 44100, bits=bits))
    assert rate == 44100
    assert back.shape == (1000, ch)
    assert np.abs(back - x).max() <= tol + 1e-12


def test_wav_float32_and_extensible():
    """Hand-built float32 and WAVE_FORMAT_EXTENSIBLE payloads decode."""
    x = np.linspace(-1, 1, 64, dtype=np.float32)
    payload = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    back, rate = decode_wav(data)
    assert rate == 16000
    assert np.allclose(back[:, 0], x, atol=1e-7)
    # extensible wrapper: tag 0xFFFE, real tag leads the SubFormat GUID
    pcm = np.clip(np.round(np.linspace(-0.5, 0.5, 32) * 32768), -32768, 32767).astype("<i2")
    fmt_ext = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
               + struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) + b"\0" * 14)
    payload2 = pcm.tobytes()
    body2 = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
             + b"data" + struct.pack("<I", len(payload2)) + payload2)
    back2, rate2 = decode_wav(b"RIFF" + struct.pack("<I", len(body2)) + body2)
    assert rate2 == 8000 and len(back2) == 32


def test_wav_rejects_compressed_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\0" * 40)
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    with pytest.raises(NotImplementedError, match="not supported"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_stage(ray_session):
    import pandas as pd
    import ray.data as rd

    from drivers_of_global_deforestation_ray.stages.multimodal import audio_features

    rows = []
    for i in range(8):
        n = 800 + i * 80
        t = np.arange(n) / 8000.0
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        rows.append({"doc_id": i, "audio": encode_wav(tone, 8000),
                     "true_n": n})
    df = pd.DataFrame(rows)
    out = audio_features(rd.from_pandas(df).repartition(2)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert "audio" not in out.columns
    assert (out["n_frames"].to_numpy() == df.sort_values("doc_id")["true_n"].to_numpy()).all()
    assert (out["sample_rate"] == 8000).all()
    assert (out["channels"] == 1).all()
    # full periods of a 0.5-amplitude sine: rms ~ 0.5/sqrt(2), zcr ~ 2f/rate
    assert np.allclose(out["rms"], 0.5 / np.sqrt(2), atol=0.01)
    assert np.allclose(out["zcr"], 2 * 440 / 8000, atol=0.01)
    assert np.allclose(out["peak"], 0.5, atol=0.01)
