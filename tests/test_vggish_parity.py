"""VGGish conv stack verified against a torch-composed oracle (the
torchvggish layout of the released checkpoint), plus HTK mel properties."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from icassp2022_depression_tpu.models import vggish
from icassp2022_depression_tpu.ops import mel


def _torch_vggish(params):
    convs = []
    for i, (cin, cout) in enumerate(vggish._CONV_CHANNELS):
        conv = tnn.Conv2d(cin, cout, 3, padding=1)
        # our layout HWIO -> torch OIHW
        conv.weight.data = torch.from_numpy(
            np.asarray(params["convs"][i]["w"]).transpose(3, 2, 0, 1).copy())
        conv.bias.data = torch.from_numpy(np.asarray(params["convs"][i]["b"]))
        convs.append(conv)
    fcs = []
    for j in range(3):
        fc = tnn.Linear(*reversed(params["fcs"][j]["w"].shape))
        fc.weight.data = torch.from_numpy(
            np.asarray(params["fcs"][j]["w"]).T.copy())
        fc.bias.data = torch.from_numpy(np.asarray(params["fcs"][j]["b"]))
        fcs.append(fc)

    def forward(x):
        x = torch.from_numpy(x)[:, None, :, :]  # NCHW
        for i, conv in enumerate(convs):
            x = torch.relu(conv(x))
            if i in vggish._POOL_AFTER:
                x = tnn.functional.max_pool2d(x, 2, 2)
        # our NHWC flatten order: [N, H, W, C]
        x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        for fc in fcs:
            x = torch.relu(fc(x))
        return x

    return forward


def test_vggish_conv_stack_matches_torch():
    params = vggish.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 96, 64)).astype(np.float32)
    got = np.asarray(vggish.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = _torch_vggish(params)(x).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_htk_mel_formula():
    # HTK scale: mel = 2595 log10(1 + f/700)
    np.testing.assert_allclose(mel.hz_to_mel(700.0, htk=True),
                               2595.0 * np.log10(2.0))
    np.testing.assert_allclose(
        mel.mel_to_hz(mel.hz_to_mel(1234.5, htk=True), htk=True), 1234.5)
    # VGGish's own matrix: unnormalised MEL-space triangles.  Discrete
    # peaks sit at or just below 1 (never forced to exactly 1 the way a
    # peak-renormalised filterbank would be), each band's weights rise
    # then fall, and the DC bin contributes nothing.
    fb = vggish._vggish_mel_matrix()
    assert fb.shape == (64, 257)
    peaks = fb.max(axis=1)
    assert np.all(peaks > 0.5) and np.all(peaks <= 1.0 + 1e-6)
    assert not np.allclose(peaks, 1.0)     # the old approximation's tell
    assert np.all(fb[:, 0] == 0.0)
    # triangle shape: exactly one contiguous support run per band
    for row in fb:
        nz = row > 0
        assert np.sum(np.abs(np.diff(nz.astype(int)))) <= 2
    # cross-check band centers against the HTK mel formula
    edges = np.linspace(mel.hz_to_mel(125.0, htk=True),
                        mel.hz_to_mel(7500.0, htk=True), 66)
    spec_mel = mel.hz_to_mel(np.linspace(0.0, 8000.0, 257), htk=True)
    for i in (0, 31, 63):
        assert abs(spec_mel[np.argmax(fb[i])] - edges[i + 1]) < \
            (spec_mel[2] - spec_mel[1]) * 60  # within bin resolution


def test_extract_eatd_vggish_matches_per_utterance_path(tmp_path):
    """The batched corpus pass (one padded conv-stack batch + segment
    means) must equal the reference-shaped per-utterance path
    ``to_vggish_embedds(...).mean(0)``, in the wav2vlad [N, 3, 1, D]
    layout, and write the _128-suffixed reference npz files."""
    import jax

    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.models import vggish

    eatd.make_synthetic_corpus(tmp_path, n_data=2, n_validation=1,
                               seconds=1.5, seed=3)
    out = tmp_path / "Features" / "AudioWhole"
    feats, sds, clf, manifest = afe.extract_eatd_vggish(
        tmp_path, out_dir=out, seed=0)
    assert feats.shape == (3, 3, 1, 128)
    assert len(manifest) == 3 and sds.shape == (3,)

    params = vggish.init(jax.random.PRNGKey(0))
    speakers = list(eatd.load_speakers(tmp_path, read_text=False))
    for i, sp in enumerate(speakers):
        for k, (w, sr) in enumerate(zip(sp.waveforms, sp.sample_rates)):
            want = vggish.to_vggish_embedds(params, np.asarray(w), sr)
            np.testing.assert_allclose(feats[i, k, 0], want.mean(0),
                                       atol=2e-5)
    with np.load(out / "whole_samples_clf_128.npz") as z:
        np.testing.assert_allclose(z["arr_0"], feats)
    with np.load(out / "whole_labels_reg_128.npz") as z:
        np.testing.assert_allclose(z["arr_0"], sds)


def test_extract_audio_cli_vggish(tmp_path):
    """`extract-audio --embedder vggish` runs end-to-end from the CLI."""
    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu.data import eatd

    eatd.make_synthetic_corpus(tmp_path, n_data=2, n_validation=0,
                               seconds=1.2, seed=4)
    rc = cli.main(["extract-audio", "--root", str(tmp_path),
                   "--embedder", "vggish"])
    assert rc == 0
    out = tmp_path / "Features" / "AudioWhole"
    with np.load(out / "whole_samples_reg_128.npz") as z:
        assert z["arr_0"].shape == (2, 3, 1, 128)


def test_vggish_bundle_autoload(tmp_path, monkeypatch):
    """A converted VGGish bundle auto-loads (ICASSP_VGGISH_WEIGHTS) in
    both extraction and serving — README's 'convert once, every consumer
    auto-loads' promise — including its embedded PCA postprocessor."""
    import jax

    from icassp2022_depression_tpu import config as C, serve
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import audio as afe
    from icassp2022_depression_tpu.models import audio_net
    from icassp2022_depression_tpu.train import checkpoints

    params = vggish.init(jax.random.PRNGKey(7))
    post = vggish.Postprocessor.random(jax.random.PRNGKey(8))
    bundle_tree = dict(params, pca={"matrix": post.pca_matrix,
                                    "means": post.pca_means.ravel()})
    bundle = tmp_path / "vggish_converted"
    checkpoints.save(bundle, bundle_tree)
    loaded, loaded_post = vggish.load_npz(bundle)
    assert loaded_post is not None
    monkeypatch.setenv("ICASSP_VGGISH_WEIGHTS", str(bundle) + ".npz")

    eatd.make_synthetic_corpus(tmp_path / "corpus", n_data=2,
                               n_validation=0, seconds=1.3, seed=12)
    from icassp2022_depression_tpu import cli
    out = tmp_path / "corpus" / "Features" / "AudioWhole"
    assert cli.main(["extract-audio", "--root", str(tmp_path / "corpus"),
                     "--embedder", "vggish"]) == 0
    with np.load(out / "whole_samples_clf_128.npz") as z:
        auto_feats = z["arr_0"]
    want, _, _, _ = afe.extract_eatd_vggish(
        tmp_path / "corpus", params=params, postprocessor=post)
    np.testing.assert_allclose(auto_feats, want, atol=2e-5)

    # serving resolves the same bundle (params + pca) lazily
    mcfg = C.replace(C.AUDIO_CLF.model, embedding_size=128)
    p = serve.Predictor(audio_net.init(jax.random.PRNGKey(9), mcfg),
                        "audio_clf", audio_embedder="vggish",
                        model_cfg=mcfg)
    sp = eatd.load_speaker(tmp_path / "corpus", "Data", 1, read_text=False)
    got = p.audio_features([sp.waveforms], [sp.sample_rates])
    np.testing.assert_allclose(got[0], want[0, :, 0, :], atol=2e-5)


def test_waveform_to_examples_scaling_continuity_and_window():
    """Upstream conventions: raw int16-scale PCM always normalises by
    32768 (no amplitude cliff between near-silent clips peaking at 1 vs
    2), already-normalised float audio passes through, and frames use
    the SYMMETRIC Hann (np.hanning) the released checkpoint was trained
    on."""
    sr = 16000
    # integral near-silent PCM: 1-peak and 2-peak clips must produce
    # comparable (same-scale) examples, not a ~16384x cliff
    base = np.zeros(sr, np.float32)
    a = base.copy(); a[::50] = 1.0
    b = base.copy(); b[::50] = 2.0
    ea = vggish.waveform_to_examples(a, sr)
    eb = vggish.waveform_to_examples(b, sr)
    # log-mel of b sits ~log(4) above a (power ratio 4), far from the
    # ~log(32768^2) gap the old range heuristic produced
    assert abs(float(np.mean(eb) - np.mean(ea))) < 3.0
    # int dtype always scales
    ec = vggish.waveform_to_examples((a * 1).astype(np.int16), sr)
    np.testing.assert_allclose(ec, ea, atol=1e-5)
    # normalised float audio (non-integral) passes through unscaled:
    # identical to the same PCM clip divided by 32768 manually
    rng = np.random.default_rng(0)
    pcm = np.round(rng.standard_normal(sr) * 2000).astype(np.float32)
    np.testing.assert_allclose(
        vggish.waveform_to_examples(pcm, sr),
        vggish.waveform_to_examples(pcm / 32768.0, sr), atol=1e-4)

    # window convention: reimplement one frame with np.hanning directly
    x = (pcm / 32768.0).astype(np.float32)
    frames = x[np.arange(vggish.STFT_WINDOW)] * np.hanning(
        vggish.STFT_WINDOW)
    spec = np.abs(np.fft.rfft(frames, n=512))
    want0 = np.log(spec @ vggish._vggish_mel_matrix().T
                   + vggish.LOG_OFFSET)
    got = vggish.waveform_to_examples(x, sr)
    np.testing.assert_allclose(got[0, 0], want0, atol=1e-4)
