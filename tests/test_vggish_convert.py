"""VGGish TF-checkpoint converter: real slim-format checkpoint in, param
pytree out, forward verified against the torch oracle with the same
tensors.  The synthetic checkpoint reproduces the released
``vggish_model.ckpt``'s exact variable names and shapes
(``Classification/audio_features_whole.py:31,41-53``)."""

import numpy as np
import jax.numpy as jnp
import pytest

tf = pytest.importorskip("tensorflow")

from icassp2022_depression_tpu.models import vggish  # noqa: E402
from icassp2022_depression_tpu.train import checkpoints  # noqa: E402


@pytest.fixture(scope="module")
def tf_ckpt(tmp_path_factory):
    """Write a slim-named checkpoint via the TF1 Saver (the released
    checkpoint's format) with random but shape-exact tensors."""
    tf1 = tf.compat.v1
    root = tmp_path_factory.mktemp("vggish_ckpt")
    rng = np.random.default_rng(0)
    graph = tf1.Graph()
    with graph.as_default():
        for scope, (cin, cout) in zip(vggish._TF_CONV_SCOPES,
                                      vggish._CONV_CHANNELS):
            tf1.get_variable(
                f"{scope}/weights",
                initializer=rng.standard_normal(
                    (3, 3, cin, cout)).astype(np.float32) * 0.05)
            tf1.get_variable(
                f"{scope}/biases",
                initializer=rng.standard_normal(cout).astype(np.float32)
                * 0.05)
        fc_dims = [(6 * 4 * 512, 4096), (4096, 4096),
                   (4096, vggish.EMBEDDING_SIZE)]
        for scope, (din, dout) in zip(vggish._TF_FC_SCOPES, fc_dims):
            tf1.get_variable(
                f"{scope}/weights",
                initializer=rng.standard_normal(
                    (din, dout)).astype(np.float32) * 0.01)
            tf1.get_variable(
                f"{scope}/biases",
                initializer=rng.standard_normal(dout).astype(np.float32)
                * 0.01)
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            path = saver.save(sess, str(root / "vggish_model.ckpt"))
    return path


def test_convert_shapes_and_forward(tf_ckpt):
    params = vggish.from_tf_checkpoint(tf_ckpt)
    ref = vggish.init(__import__("jax").random.PRNGKey(0))
    import jax
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(ref))
    for got, want in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(ref)):
        assert got.shape == want.shape

    from test_vggish_parity import _torch_vggish
    import torch
    x = np.random.default_rng(1).standard_normal((2, 96, 64)).astype(
        np.float32)
    got = np.asarray(vggish.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = _torch_vggish(params)(x).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_pca_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    means = rng.standard_normal(128).astype(np.float32)
    np.savez(tmp_path / "vggish_pca_params.npz",
             pca_eigen_vectors=q.astype(np.float32), pca_means=means)
    post = vggish.load_pca_params(tmp_path / "vggish_pca_params.npz")
    emb = rng.standard_normal((5, 128)).astype(np.float32)
    out = post(emb)
    assert out.dtype == np.uint8 and out.shape == (5, 128)
    # uint8 quantisation of clip[-2,2] of the centred projection
    want = np.clip((q.astype(np.float32) @ (emb.T - means[:, None])).T,
                   -2, 2)
    want = ((want + 2.0) * (255.0 / 4.0)).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


# import the script as a module without packaging it
import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "convert_vggish_script",
    Path(__file__).resolve().parent.parent / "scripts" / "convert_vggish.py")
_script = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_script)


def test_script_end_to_end(tf_ckpt, tmp_path, capsys):
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    np.savez(tmp_path / "pca.npz", pca_eigen_vectors=q.astype(np.float32),
             pca_means=rng.standard_normal(128).astype(np.float32))
    out = tmp_path / "vggish_converted"
    rc = _script.main([tf_ckpt, "--pca", str(tmp_path / "pca.npz"),
                       "-o", str(out)])
    assert rc == 0
    loaded = checkpoints.load(str(out))
    assert loaded["pca"]["matrix"].shape == (128, 128)
    assert loaded["convs"]["0"]["w"].shape == (3, 3, 1, 64)
