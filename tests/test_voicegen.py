"""Voice-bank synthesizer: outputs must be speech-shaped, not noise.

The rest of the pipeline (SRP-PHAT phase coherence, energy-segment metrics,
separation masks) assumes speech-like structure; these tests pin the
properties that matter."""
import numpy as np

from acousticswarms_speech_tpu.data.voicegen import (
    SpeakerProfile,
    generate_voice_bank,
    synthesize_utterance,
)

FS = 48000


def _synth(seed, duration=2.0):
    rng = np.random.default_rng(seed)
    return synthesize_utterance(SpeakerProfile(rng), duration, rng, FS)


def test_utterance_shape_and_level():
    y = _synth(0)
    assert y.shape == (2 * FS,)
    assert y.dtype == np.float32
    assert 0.02 < y.std() < 0.3
    assert np.abs(y).max() <= 0.5


def test_voiced_segments_are_harmonic():
    """The strongest frame must show a clear pitch-period autocorrelation
    peak in the human f0 range (70-320 Hz)."""
    y = _synth(1, duration=3.0)
    frames = y[: len(y) // 2400 * 2400].reshape(-1, 2400)
    seg_start = int(np.argmax(frames.std(axis=1))) * 2400
    seg = y[seg_start : seg_start + 2048]
    ac = np.correlate(seg, seg, "full")[2047:]
    lo, hi = FS // 320, FS // 70
    peak = float(ac[lo:hi].max() / (ac[0] + 1e-9))
    assert peak > 0.25, f"no harmonic structure (norm ac peak {peak:.3f})"


def test_has_pauses_and_speech_band_centroid():
    y = _synth(2, duration=4.0)
    frames = y[: len(y) // 2400 * 2400].reshape(-1, 2400)
    e = frames.std(axis=1)
    silent = float((e < 0.05 * np.median(e[e > 0])).mean())
    assert 0.0 < silent < 0.6, f"silence fraction {silent}"
    S = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(len(y), 1 / FS)
    centroid = float((S * f).sum() / S.sum())
    assert 300 < centroid < 4500, f"spectral centroid {centroid} not speechy"


def test_speaker_identity_differs():
    """Two speakers must differ in register (mean f0 proxy via zero-crossing
    of the strongest voiced frame is too crude; compare long-term spectra)."""
    ys = [_synth(s, duration=3.0) for s in (3, 4)]
    specs = []
    for y in ys:
        S = np.abs(np.fft.rfft(y)) + 1e-9
        specs.append(S / S.sum())
    # Jensen-Shannon-ish divergence should be clearly nonzero
    m = 0.5 * (specs[0] + specs[1])
    d = 0.5 * (specs[0] * np.log(specs[0] / m)).sum() + \
        0.5 * (specs[1] * np.log(specs[1] / m)).sum()
    assert d > 0.01, f"speakers spectrally indistinguishable (JS {d:.4f})"


def test_generate_voice_bank_layout(tmp_path):
    generate_voice_bank(str(tmp_path), n_speakers=2, clips_per_speaker=2,
                        duration=0.5, seed=0)
    from acousticswarms_speech_tpu.utils.audio import read_wav

    wav, sr = read_wav(str(tmp_path / "spk000" / "clip1.wav"))
    assert sr == FS and wav.shape == (1, FS // 2)
