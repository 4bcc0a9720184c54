"""Tensor-parallel LSTMP biLM vs the serial scan on the virtual mesh.

The TP layer shards the 4C gate dimension and the memory cell over the
``model`` axis with one psum per step at the projection; results must
match the serial ``ops/rnn.py::lstmp_layer`` scan up to psum reduction
order (exact f32 on CPU up to summation order -> 1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icassp2022_depression_tpu.models import elmo
from icassp2022_depression_tpu.ops import rnn as rnn_ops
from icassp2022_depression_tpu.parallel import elmo_tp, mesh as mesh_mod

CELL, PROJ, DIN = 256, 64, 64


@pytest.fixture(scope="module")
def tp_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    return mesh_mod.make_mesh(4, model_parallel=4)


def test_lstmp_layer_tp_matches_serial(tp_mesh):
    p = rnn_ops.init_lstmp(jax.random.PRNGKey(0), DIN, CELL, PROJ)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 12, DIN))
    ys_s, h_s, c_s = rnn_ops.lstmp_layer(p, x, backend="xla")
    p_tp = elmo_tp.shard_lstmp_params(tp_mesh, p)
    ys_t, h_t, c_t = elmo_tp.lstmp_layer_tp(tp_mesh, p_tp, x)
    np.testing.assert_allclose(np.asarray(ys_t), np.asarray(ys_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(c_s), atol=1e-5)


def test_lstmp_layer_tp_reverse_and_clips(tp_mesh):
    p = rnn_ops.init_lstmp(jax.random.PRNGKey(2), DIN, CELL, PROJ)
    # scale up so the +-3 clips actually bind
    p = jax.tree_util.tree_map(lambda a: a * 3.0, p)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 9, DIN)) * 2.0
    ys_s, h_s, c_s = rnn_ops.lstmp_layer(p, x, reverse=True, backend="xla")
    p_tp = elmo_tp.shard_lstmp_params(tp_mesh, p)
    ys_t, h_t, c_t = elmo_tp.lstmp_layer_tp(tp_mesh, p_tp, x, reverse=True)
    assert float(jnp.abs(jnp.asarray(ys_s)).max()) <= 3.0  # clips bound
    np.testing.assert_allclose(np.asarray(ys_t), np.asarray(ys_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(c_s), atol=1e-5)


def test_encode_lstmp_tp_matches_serial(tp_mesh):
    cfg = elmo.ElmoLstmpConfig(input_dim=DIN, cell_size=CELL,
                               proj_size=DIN, layers=2)
    params = elmo.init_lstmp_encoder(jax.random.PRNGKey(4), cfg)
    params = {"layers": params["layers"]}
    reps = jax.random.normal(jax.random.PRNGKey(5), (4, 10, DIN))
    lengths = jnp.asarray([10, 7, 4, 2])
    rep_s, pooled_s = elmo.encode_lstmp_from_reps(params, reps, lengths,
                                                  cfg)
    params_tp = elmo_tp.shard_encoder_params(tp_mesh, params)
    rep_t, pooled_t = elmo_tp.encode_lstmp_from_reps_tp(
        tp_mesh, params_tp, reps, lengths, cfg)
    np.testing.assert_allclose(np.asarray(pooled_t), np.asarray(pooled_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rep_t), np.asarray(rep_s),
                               atol=1e-4)


def test_encode_lstmp_tp_real_zhs_geometry(tp_mesh):
    """TP == serial at the REAL zhs biLM geometry (4096-cell / 512-proj /
    2 layers — the shapes `extract-text --elmo-tp` ships), not just the
    toy dims above: the 4-way shard leaves 1024 cells per device and the
    per-step psum carries the full [B, 512] projection."""
    cfg = elmo.ElmoLstmpConfig(vocab_size=64)  # geometry fields default
    assert (cfg.cell_size, cfg.proj_size, cfg.layers) == (4096, 512, 2)
    params = {"layers":
              elmo.init_lstmp_encoder(jax.random.PRNGKey(6), cfg)["layers"]}
    reps = jax.random.normal(jax.random.PRNGKey(7), (8, 12, cfg.input_dim))
    lengths = jnp.asarray([12, 11, 9, 8, 6, 4, 2, 1])
    rep_s, pooled_s = elmo.encode_lstmp_from_reps(params, reps, lengths,
                                                  cfg)
    params_tp = elmo_tp.shard_encoder_params(tp_mesh, params)
    rep_t, pooled_t = elmo_tp.encode_lstmp_from_reps_tp(
        tp_mesh, params_tp, reps, lengths, cfg)
    np.testing.assert_allclose(np.asarray(pooled_t), np.asarray(pooled_s),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(rep_t), np.asarray(rep_s),
                               atol=1e-3)


def _tiny_pretrained():
    from icassp2022_depression_tpu.models import char_cnn, elmo_pretrained

    ccfg = char_cnn.CharCnnConfig(n_chars=46, char_dim=8,
                                  filters=((1, 8), (2, 8)), n_highway=1,
                                  output_dim=16, max_chars=8)
    lcfg = elmo.ElmoLstmpConfig(vocab_size=32, input_dim=16, cell_size=32,
                                proj_size=16, layers=2)
    cc = char_cnn.init(jax.random.PRNGKey(8), ccfg)
    enc = {"layers": elmo.init_lstmp_encoder(jax.random.PRNGKey(9),
                                             lcfg)["layers"]}
    specials = ["<pad>", "<oov>", "<bos>", "<eos>", "<bow>", "<eow>"]
    char_lex = {t: i for i, t in enumerate(specials)}
    for c in range(0x4E00, 0x4E00 + 40):
        char_lex[chr(c)] = len(char_lex)
    return elmo_pretrained.PretrainedElmo(ccfg, lcfg, cc, enc, char_lex,
                                          None)


def _tiny_sents(n=12, seed=10):
    rng = np.random.default_rng(seed)
    chars = [chr(c) for c in range(0x4E00, 0x4E00 + 40)]
    return [["".join(rng.choice(chars, int(rng.integers(1, 4))))
             for _ in range(int(rng.integers(1, 9)))] for _ in range(n)]


def test_pretrained_elmo_tp_matches_serial(tp_mesh):
    """PretrainedElmo.enable_tp: the product TP path (char-CNN replicated
    -> TP biLM -> interior mean) equals the serial embed_sentences."""
    sents = _tiny_sents()
    pe = _tiny_pretrained()
    want = pe.embed_sentences(sents, batch_size=8)
    pe_tp = _tiny_pretrained()
    pe_tp.enable_tp(tp_mesh)
    got = pe_tp.embed_sentences(sents, batch_size=8)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_enable_tp_rejects_stateful(tp_mesh):
    pe = _tiny_pretrained()
    pe.stateful = True
    with pytest.raises(ValueError, match="stateless-only"):
        pe.enable_tp(tp_mesh)


def test_make_embedder_elmo_tp_matches_serial():
    """frontend.text.make_embedder(elmo_tp=N): the PRNG-LSTMP stand-in
    embeds identically serial vs tensor-parallel."""
    from icassp2022_depression_tpu.frontend import text as text_fe

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    cfg = elmo.ElmoLstmpConfig(vocab_size=64, input_dim=16, cell_size=32,
                               proj_size=16, layers=2)
    sents = _tiny_sents(n=7, seed=11)
    emb_s, dim_s, id_s = text_fe.make_embedder(cfg=cfg, elmo_weights=None,
                                               with_id=True)
    emb_t, dim_t, id_t = text_fe.make_embedder(cfg=cfg, elmo_weights=None,
                                               with_id=True, elmo_tp=4)
    assert dim_s == dim_t == cfg.output_dim
    # ids stay byte-identical: TP is an execution strategy, not a
    # semantic change, and serving compares ids against extraction
    # sidecars byte-for-byte
    assert id_t == id_s
    np.testing.assert_allclose(emb_t(sents), emb_s(sents), atol=1e-5)


def test_make_embedder_elmo_tp_rejects_plain_bilstm():
    from icassp2022_depression_tpu.frontend import text as text_fe

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    with pytest.raises(ValueError, match="no tensor-parallel layout"):
        text_fe.make_embedder(cfg=elmo.ElmoConfig(vocab_size=64,
                                                  embed_dim=8, hidden=8,
                                                  layers=1),
                              elmo_weights=None, elmo_tp=2)


def test_model_mesh_clear_error_when_too_few_devices():
    with pytest.raises(ValueError, match="needs >= 100 devices"):
        elmo_tp.model_mesh(100)
