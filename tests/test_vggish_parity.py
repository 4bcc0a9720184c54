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
    fb = mel.mel_filterbank(16000, 512, 64, fmin=125.0, fmax=7500.0, htk=True)
    assert fb.shape == (64, 257)
    # VGGish uses peak-normalised (unnormalised-area) filters
    unnorm = vggish._unnormalised(fb)
    assert np.allclose(unnorm.max(axis=1), 1.0, atol=1e-6)
