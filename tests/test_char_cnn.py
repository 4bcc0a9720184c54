"""Char-CNN token embedder vs an independent NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.models import char_cnn

CFG = char_cnn.CharCnnConfig(n_chars=40, char_dim=8,
                             filters=((1, 4), (2, 6), (3, 8)),
                             n_highway=2, output_dim=16, max_chars=7)


def _oracle(p, char_ids, cfg):
    b, t, c = char_ids.shape
    emb = np.asarray(p["char_emb"])
    outs = []
    x = emb[char_ids.reshape(b * t, c)]          # [BT, C, D]
    for conv in p["convs"]:
        w = np.asarray(conv["w"])                # [out, D, width]
        bias = np.asarray(conv["b"])
        out_ch, _, width = w.shape
        n_pos = c - width + 1
        y = np.zeros((b * t, out_ch, n_pos))
        for pos in range(n_pos):
            seg = x[:, pos:pos + width, :]       # [BT, width, D]
            y[:, :, pos] = np.einsum("bwd,odw->bo", seg, w)
        y = y + bias[None, :, None]
        y = y.max(axis=-1)
        outs.append(np.maximum(y, 0.0))
    h = np.concatenate(outs, axis=-1)
    f = cfg.n_filters
    for hw in p["highways"]:
        proj = h @ np.asarray(hw["w"]).T + np.asarray(hw["b"])
        nonlinear = np.maximum(proj[:, :f], 0.0)
        gate = 1.0 / (1.0 + np.exp(-proj[:, f:]))
        h = gate * h + (1.0 - gate) * nonlinear
    out = h @ np.asarray(p["projection"]["w"]).T + np.asarray(p["projection"]["b"])
    return out.reshape(b, t, cfg.output_dim)


def test_char_cnn_matches_oracle():
    params = char_cnn.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    char_ids = rng.integers(0, 40, (2, 3, 7)).astype(np.int32)
    got = np.asarray(char_cnn.embed_tokens(params, jnp.asarray(char_ids), CFG))
    want = _oracle(params, char_ids, CFG)
    np.testing.assert_allclose(got, want, atol=1e-4)


def _lexicon(extra):
    """Minimal char lexicon with the special markers build_batch needs."""
    from icassp2022_depression_tpu.models import elmo_pretrained as ep

    lex = {ep.PAD: 0, ep.BOW: 10, ep.EOW: 11, ep.OOV: 9,
           ep.BOS: 12, ep.EOS: 13}
    lex.update(extra)
    return lex


def test_build_batch_char_ids():
    """Marker placement and OOV mapping (the char-id builder is defined
    ONCE, in elmo_pretrained.build_batch — upstream conventions incl. the
    bow/eow key swap)."""
    from icassp2022_depression_tpu.models import elmo_pretrained as ep

    lex = _lexicon({"a": 3, "b": 4, "好": 5})
    bow, eow = (lex[ep.EOW], lex[ep.BOW]) if ep.SWAP_BOW_EOW else \
               (lex[ep.BOW], lex[ep.EOW])
    ids, word_ids, lengths = ep.build_batch([["ab", "好", "zzz"]], lex,
                                            None, max_chars=5)
    assert word_ids is None
    # wrapped: <S> ab 好 zzz </S> -> length 5
    np.testing.assert_array_equal(lengths, [5])
    np.testing.assert_array_equal(ids[0, 1], [bow, 3, 4, eow, 0])
    np.testing.assert_array_equal(ids[0, 2], [bow, 5, eow, 0, 0])
    np.testing.assert_array_equal(ids[0, 3], [bow, 9, 9, 9, eow])


def test_from_elmoformanylangs_mapping_and_word_branch():
    cfg = char_cnn.CharCnnConfig(n_chars=20, char_dim=4,
                                 filters=((1, 3), (2, 5)), n_highway=1,
                                 output_dim=8, word_vocab=11, word_dim=6,
                                 max_chars=5)
    rng = np.random.default_rng(1)
    f = cfg.n_filters
    sd = {
        "token_embedder.char_emb_layer.embedding.weight":
            rng.standard_normal((20, 4)).astype(np.float32),
        "token_embedder.word_emb_layer.embedding.weight":
            rng.standard_normal((11, 6)).astype(np.float32),
        "token_embedder.projection.weight":
            rng.standard_normal((8, f + 6)).astype(np.float32),
        "token_embedder.projection.bias":
            rng.standard_normal(8).astype(np.float32),
    }
    for i, (w, out) in enumerate(cfg.filters):
        sd[f"token_embedder.convolutions.{i}.weight"] = \
            rng.standard_normal((out, 4, w)).astype(np.float32)
        sd[f"token_embedder.convolutions.{i}.bias"] = \
            rng.standard_normal(out).astype(np.float32)
    sd["token_embedder.highways._layers.0.weight"] = \
        rng.standard_normal((2 * f, f)).astype(np.float32)
    sd["token_embedder.highways._layers.0.bias"] = \
        rng.standard_normal(2 * f).astype(np.float32)

    params = char_cnn.from_elmoformanylangs_token_embedder(sd, cfg)
    char_ids = jnp.asarray(rng.integers(0, 20, (1, 4, 5)).astype(np.int32))
    word_ids = jnp.asarray(rng.integers(0, 11, (1, 4)).astype(np.int32))
    out = char_cnn.embed_tokens(params, char_ids, cfg, word_ids)
    assert out.shape == (1, 4, 8)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(
        np.asarray(params["word_emb"]),
        sd["token_embedder.word_emb_layer.embedding.weight"])


def test_build_batch_long_token_keeps_markers():
    """Over-long tokens truncate the TOKEN, not the end-of-word marker
    (upstream's rule: leave room for BOTH markers)."""
    from icassp2022_depression_tpu.models import elmo_pretrained as ep

    lex = _lexicon({c: 3 + i for i, c in enumerate("abcdefg")})
    bow, eow = (lex[ep.EOW], lex[ep.BOW]) if ep.SWAP_BOW_EOW else \
               (lex[ep.BOW], lex[ep.EOW])
    ids, _, _ = ep.build_batch([["abcdefg"]], lex, None, max_chars=5)
    np.testing.assert_array_equal(ids[0, 1], [bow, 3, 4, 5, eow])
