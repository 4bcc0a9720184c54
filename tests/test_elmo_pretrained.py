"""Pretrained ELMoForManyLangs path vs an independent torch oracle.

Builds a synthetic released-model directory — the exact on-disk layout of
the zhs.model zip (state-dict pickles with upstream key names, tab-
separated lexicons, indirected config.json) at a small geometry — runs the
framework's converter + npz roundtrip + jitted batched encoder, and
compares every pooled sentence embedding against a torch re-implementation
of ELMoForManyLangs' ``Model.forward`` + ``sents2elmo(output_layer=-1)``
written from upstream semantics (ConvTokenEmbedder word-first concat,
allennlp ``LstmCellWithProjection`` gate order/clipping, inter-layer
residuals, BOS/EOS wrap + strip, swapped bow/eow markers).
"""

import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from icassp2022_depression_tpu.models import elmo_pretrained

CHAR_DIM = 8
FILTERS = [[1, 4], [2, 8], [3, 12]]
NFILT = 4 + 8 + 12
N_HIGHWAY = 2
WORD_DIM = 6
PROJ = 16          # projection_dim == biLM input/proj size
CELL = 32
LAYERS = 2
MAX_CHARS = 6      # small so truncation triggers
SPECIALS = ["<pad>", "<oov>", "<bos>", "<eos>", "<bow>", "<eow>"]
CHARS = list("今天气很好我有点累高兴不太想说话了谢") + ["　"]
WORDS = ["今天", "天气", "很", "好", "我", "有点", "累", "不", "太",
         "想", "说话", "了"]

SENTS = [
    ["今天", "天气", "很", "好"],
    ["我", "有点", "累", "不", "太", "想", "说话", "了"],
    ["我", "很", "高兴"],          # 高兴 is word-OOV; chars in-dic
    ["谢谢谢谢谢谢", "好"],          # token longer than max_chars-2
]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("zhs.model")
    torch.manual_seed(0)

    char_lex = {tok: i for i, tok in enumerate(SPECIALS + CHARS)}
    word_lex = {tok: i for i, tok in enumerate(SPECIALS[:4] + WORDS)}
    with open(root / "char.dic", "w", encoding="utf-8") as f:
        for tok, i in char_lex.items():
            f.write(f"{tok}\t{i}\n")
    with open(root / "word.dic", "w", encoding="utf-8") as f:
        for tok, i in word_lex.items():
            f.write(f"{tok}\t{i}\n")

    arch = {
        "encoder": {"name": "elmo", "projection_dim": PROJ, "dim": CELL,
                    "n_layers": LAYERS, "cell_clip": 3, "proj_clip": 3},
        "token_embedder": {"name": "cnn", "activation": "relu",
                           "filters": FILTERS, "n_highway": N_HIGHWAY,
                           "word_dim": WORD_DIM, "char_dim": CHAR_DIM,
                           "max_characters_per_token": MAX_CHARS},
    }
    (root / "cnn_small.json").write_text(json.dumps(arch))
    # released zips record a stale absolute config_path; basename fallback
    (root / "config.json").write_text(json.dumps(
        {"config_path": "/home/someone/configs/cnn_small.json"}))

    te = {
        "char_emb_layer.embedding.weight":
            torch.randn(len(char_lex), CHAR_DIM),
        "word_emb_layer.embedding.weight":
            torch.randn(len(word_lex), WORD_DIM),
        "projection.weight": torch.randn(PROJ, WORD_DIM + NFILT) * 0.3,
        "projection.bias": torch.randn(PROJ) * 0.1,
    }
    for i, (w, out) in enumerate(FILTERS):
        te[f"convolutions.{i}.weight"] = torch.randn(out, CHAR_DIM, w) * 0.3
        te[f"convolutions.{i}.bias"] = torch.randn(out) * 0.1
    for i in range(N_HIGHWAY):
        te[f"highways._layers.{i}.weight"] = torch.randn(2 * NFILT,
                                                         NFILT) * 0.2
        te[f"highways._layers.{i}.bias"] = torch.randn(2 * NFILT) * 0.1
    torch.save(te, root / "token_embedder.pkl")

    enc = {}
    for d in ("forward", "backward"):
        for k in range(LAYERS):
            p = f"{d}_layer_{k}"
            enc[f"{p}.input_linearity.weight"] = \
                torch.randn(4 * CELL, PROJ) * 0.2
            enc[f"{p}.state_linearity.weight"] = \
                torch.randn(4 * CELL, PROJ) * 0.2
            enc[f"{p}.state_linearity.bias"] = torch.randn(4 * CELL) * 0.1
            enc[f"{p}.state_projection.weight"] = \
                torch.randn(PROJ, CELL) * 0.2
    torch.save(enc, root / "encoder.pkl")
    return root, char_lex, word_lex, te, enc


# --------------------------- torch oracle ---------------------------------


def _oracle_token_embedder(te, char_ids, word_ids):
    x = te["char_emb_layer.embedding.weight"][char_ids]   # [T, C, D]
    x = x.transpose(1, 2)                                  # [T, D, C]
    convs = []
    i = 0
    while f"convolutions.{i}.weight" in te:
        y = F.conv1d(x, te[f"convolutions.{i}.weight"],
                     te[f"convolutions.{i}.bias"])
        y, _ = torch.max(y, dim=-1)
        convs.append(F.relu(y))
        i += 1
    h = torch.cat(convs, dim=-1)
    f = h.shape[-1]
    j = 0
    while f"highways._layers.{j}.weight" in te:
        proj = h @ te[f"highways._layers.{j}.weight"].t() + \
            te[f"highways._layers.{j}.bias"]
        nonlinear = F.relu(proj[:, :f])
        gate = torch.sigmoid(proj[:, f:])
        h = gate * h + (1.0 - gate) * nonlinear
        j += 1
    w = te["word_emb_layer.embedding.weight"][word_ids]
    emb = torch.cat([w, h], dim=-1)                        # word FIRST
    return emb @ te["projection.weight"].t() + te["projection.bias"]


def _oracle_lstmp_dir(enc, prefix, x, cell, proj, clip=3.0,
                      h0=None, c0=None):
    """One direction over one row's valid tokens; optional initial state
    (allennlp ``LstmCellWithProjection`` with non-None initial_state).
    Returns (outputs [T, proj], h_last, c_last)."""
    w_x = enc[f"{prefix}.input_linearity.weight"]
    w_h = enc[f"{prefix}.state_linearity.weight"]
    b = enc[f"{prefix}.state_linearity.bias"]
    w_p = enc[f"{prefix}.state_projection.weight"]
    h = torch.zeros(proj) if h0 is None else h0.clone()
    c = torch.zeros(cell) if c0 is None else c0.clone()
    outs = []
    for t in range(x.shape[0]):
        z = w_x @ x[t] + w_h @ h + b
        i = torch.sigmoid(z[:cell])
        f = torch.sigmoid(z[cell:2 * cell])
        g = torch.tanh(z[2 * cell:3 * cell])
        o = torch.sigmoid(z[3 * cell:])
        c = i * g + f * c
        c = torch.clamp(c, -clip, clip)
        h = torch.clamp(w_p @ (o * torch.tanh(c)), -clip, clip)
        outs.append(h)
    return torch.stack(outs), h, c


def _oracle_ids(sent, char_lex, word_lex):
    """Wrapped/truncated sentence -> (char_ids [T, MAX_CHARS],
    word_ids [T]) with upstream's swapped bow/eow markers."""
    toks = ["<bos>"]
    for tok in sent:
        if len(tok) + 2 > MAX_CHARS:
            tok = tok[:MAX_CHARS - 2]
        toks.append(tok)
    toks.append("<eos>")
    t_len = len(toks)
    # upstream create_one_batch fetches the markers swapped:
    bow, eow = char_lex["<eow>"], char_lex["<bow>"]
    char_ids = torch.full((t_len, MAX_CHARS), char_lex["<pad>"],
                          dtype=torch.long)
    word_ids = torch.zeros(t_len, dtype=torch.long)
    for j, tok in enumerate(toks):
        char_ids[j, 0] = bow
        if tok in ("<bos>", "<eos>"):
            char_ids[j, 1] = char_lex[tok]
            char_ids[j, 2] = eow
        else:
            for k, ch in enumerate(tok):
                char_ids[j, k + 1] = char_lex.get(ch, char_lex["<oov>"])
            char_ids[j, len(tok) + 1] = eow
        word_ids[j] = word_lex.get(tok, word_lex["<oov>"])
    return char_ids, word_ids


def _oracle_embed(te, enc, sent, char_lex, word_lex):
    char_ids, word_ids = _oracle_ids(sent, char_lex, word_lex)
    with torch.no_grad():
        emb = _oracle_token_embedder(te, char_ids, word_ids)   # [T, P]
        layer_reps = [torch.cat([emb, emb], dim=-1)]
        f_in = b_in = emb
        for k in range(LAYERS):
            f_out, _, _ = _oracle_lstmp_dir(enc, f"forward_layer_{k}", f_in,
                                            CELL, PROJ)
            b_out_rev, _, _ = _oracle_lstmp_dir(enc, f"backward_layer_{k}",
                                                torch.flip(b_in, [0]),
                                                CELL, PROJ)
            b_out = torch.flip(b_out_rev, [0])
            if k > 0:
                f_out = f_out + f_in
                b_out = b_out + b_in
            layer_reps.append(torch.cat([f_out, b_out], dim=-1))
            f_in, b_in = f_out, b_out
        avg = torch.stack(layer_reps).mean(dim=0)              # [T, 2P]
        return avg[1:-1].mean(dim=0).numpy()                   # strip + mean


class _OracleStatefulElmo:
    """Independent torch oracle of the UPSTREAM stateful pipeline:
    ``Embedder.sents2elmo`` over an ``ElmobiLm`` that is allennlp
    ``_EncoderBase(stateful=True)`` — corpus length-sorted descending
    (``create_batches(sort=True)``, stable on ties), per-row
    ``LstmCellWithProjection`` recurrences seeded from the carried states,
    ``_get_initial_states`` slice/expand on batch-size change,
    ``_update_states`` used-rows masking, state persisting across
    ``embed`` calls like the reference's single long-lived ``Embedder``
    (``Classification/text_features_whole.py:16,40``)."""

    def __init__(self, te, enc, char_lex, word_lex):
        self.te, self.enc = te, enc
        self.char_lex, self.word_lex = char_lex, word_lex
        self.states = None  # (h [L, B, 2P], c [L, B, 2C])

    def _prepare(self, batch):
        if self.states is None:
            return (torch.zeros(LAYERS, batch, 2 * PROJ),
                    torch.zeros(LAYERS, batch, 2 * CELL))
        h, c = self.states
        stored = h.shape[1]
        if batch > stored:
            h = torch.cat([h, torch.zeros(LAYERS, batch - stored,
                                          2 * PROJ)], 1)
            c = torch.cat([c, torch.zeros(LAYERS, batch - stored,
                                          2 * CELL)], 1)
            self.states = (h, c)  # upstream mutates the store on expand
        return h[:, :batch].clone(), c[:, :batch].clone()

    def _update(self, h_n, c_n):
        if self.states is None:
            self.states = (h_n, c_n)
            return
        old_h, old_c = self.states
        stored, batch = old_h.shape[1], h_n.shape[1]
        used_h = (h_n[0].sum(-1) != 0.0).float()[None, :, None]
        used_c = (c_n[0].sum(-1) != 0.0).float()[None, :, None]
        if stored > batch:
            old_h[:, :batch] = h_n * used_h + old_h[:, :batch] * (1 - used_h)
            old_c[:, :batch] = c_n * used_c + old_c[:, :batch] * (1 - used_c)
            self.states = (old_h, old_c)
        else:
            self.states = (h_n * used_h + old_h * (1 - used_h),
                           c_n * used_c + old_c * (1 - used_c))

    def _forward_batch(self, sents):
        batch = len(sents)
        h0, c0 = self._prepare(batch)
        h_n = torch.zeros(LAYERS, batch, 2 * PROJ)
        c_n = torch.zeros(LAYERS, batch, 2 * CELL)
        pooled = []
        with torch.no_grad():
            for b, sent in enumerate(sents):
                char_ids, word_ids = _oracle_ids(sent, self.char_lex,
                                                 self.word_lex)
                emb = _oracle_token_embedder(self.te, char_ids, word_ids)
                layer_reps = [torch.cat([emb, emb], dim=-1)]
                f_in = b_in = emb
                for k in range(LAYERS):
                    f_out, fh, fc = _oracle_lstmp_dir(
                        self.enc, f"forward_layer_{k}", f_in, CELL, PROJ,
                        h0=h0[k, b, :PROJ], c0=c0[k, b, :CELL])
                    b_out_rev, bh, bc = _oracle_lstmp_dir(
                        self.enc, f"backward_layer_{k}",
                        torch.flip(b_in, [0]), CELL, PROJ,
                        h0=h0[k, b, PROJ:], c0=c0[k, b, CELL:])
                    b_out = torch.flip(b_out_rev, [0])
                    if k > 0:
                        f_out = f_out + f_in
                        b_out = b_out + b_in
                    layer_reps.append(torch.cat([f_out, b_out], dim=-1))
                    h_n[k, b] = torch.cat([fh, bh])
                    c_n[k, b] = torch.cat([fc, bc])
                    f_in, b_in = f_out, b_out
                avg = torch.stack(layer_reps).mean(dim=0)
                pooled.append(avg[1:-1].mean(dim=0))
        self._update(h_n, c_n)
        return torch.stack(pooled)

    def embed(self, sents, batch_size):
        n = len(sents)
        order = sorted(range(n), key=lambda i: -len(sents[i]))
        out = torch.zeros(n, 2 * PROJ)
        for start in range(0, n, batch_size):
            idxs = order[start:start + batch_size]
            pooled = self._forward_batch([sents[i] for i in idxs])
            for j, i in enumerate(idxs):
                out[i] = pooled[j]
        return out.numpy()


# ------------------------------- tests ------------------------------------


def test_convert_roundtrip_matches_oracle(model_dir, tmp_path):
    root, char_lex, word_lex, te, enc = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    bundle = tmp_path / "elmo_small.npz"
    elmo_pretrained.save_npz(bundle, pe)
    pe2 = elmo_pretrained.load_npz(bundle)

    got = pe2.embed_sentences(SENTS, batch_size=3)  # spans 2 padded batches
    want = np.stack([_oracle_embed(te, enc, s, char_lex, word_lex)
                     for s in SENTS])
    assert got.shape == (len(SENTS), 2 * PROJ)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_converted_configs(model_dir):
    root, char_lex, word_lex, _, _ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    assert pe.char_cfg.n_chars == len(char_lex)
    assert pe.char_cfg.word_vocab == len(word_lex)
    assert pe.char_cfg.filters == tuple((w, c) for w, c in FILTERS)
    assert pe.lstmp_cfg.cell_size == CELL
    assert pe.lstmp_cfg.proj_size == PROJ
    assert pe.output_dim == 2 * PROJ


def test_extract_eatd_autoloads_bundle(model_dir, tmp_path, monkeypatch):
    """extract-text picks converted weights up from ICASSP_ELMO_WEIGHTS
    and produces pretrained (not PRNG-encoder) embeddings."""
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import text as text_fe

    root, *_ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    bundle = tmp_path / "elmo_small.npz"
    elmo_pretrained.save_npz(bundle, pe)

    corpus = tmp_path / "corpus"
    eatd.make_synthetic_corpus(corpus, n_data=2, n_validation=0, seconds=0.2)

    monkeypatch.setenv("ICASSP_ELMO_WEIGHTS", str(bundle))
    feats, sds, clf = text_fe.extract_eatd(corpus)
    assert feats.shape == (2, 3, pe.output_dim)  # 2*PROJ, not the 1024 stub

    monkeypatch.delenv("ICASSP_ELMO_WEIGHTS")
    feats_stub, *_ = text_fe.extract_eatd(corpus, elmo_weights=None)
    assert feats_stub.shape[2] == 1024


def test_extract_eatd_elmo_tp_matches_serial(model_dir, tmp_path,
                                             monkeypatch):
    """`extract-text --elmo-tp N` with a converted bundle: the TP biLM
    produces the same features as the serial encoder (CELL=32 shards 4-way
    on the virtual mesh)."""
    import jax

    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import text as text_fe

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    root, *_ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    bundle = tmp_path / "elmo_small.npz"
    elmo_pretrained.save_npz(bundle, pe)

    corpus = tmp_path / "corpus"
    eatd.make_synthetic_corpus(corpus, n_data=2, n_validation=1,
                               seconds=0.2)
    monkeypatch.setenv("ICASSP_ELMO_WEIGHTS", str(bundle))
    want, *_ = text_fe.extract_eatd(corpus)
    got, *_ = text_fe.extract_eatd(corpus, elmo_tp=4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_extract_eatd_stateful_mode(model_dir, tmp_path, monkeypatch):
    """--elmo-stateful: one embed call per speaker with carried state —
    later speakers' embeddings shift (corpus-order dependence), the first
    speaker's do not (fresh zero state, like the default mode)."""
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import text as text_fe

    root, *_ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    bundle = tmp_path / "elmo_small.npz"
    elmo_pretrained.save_npz(bundle, pe)
    corpus = tmp_path / "corpus"
    eatd.make_synthetic_corpus(corpus, n_data=3, n_validation=0, seconds=0.2)

    monkeypatch.setenv("ICASSP_ELMO_WEIGHTS", str(bundle))
    default, *_ = text_fe.extract_eatd(corpus)
    stateful, *_ = text_fe.extract_eatd(corpus, elmo_stateful=True)
    assert stateful.shape == default.shape == (3, 3, pe.output_dim)
    # speaker 1: the very first sents2elmo call starts from zeros
    np.testing.assert_allclose(stateful[0], default[0], atol=1e-5)
    # a later speaker sees carried state -> embeddings differ
    assert np.abs(stateful[2] - default[2]).max() > 1e-6


CORPUS_A = [
    ["我", "有点", "累", "不", "太", "想", "说话", "了"],      # len 8
    ["今天", "天气", "很", "好"],                               # len 4
    ["我", "很", "高兴"],                                       # len 3
    ["今天", "天气", "很", "好", "我", "很", "高兴"],            # len 7
    ["好"],                                                     # len 1
    ["我", "不", "想", "说话"],                                  # len 4 (tie)
    ["谢谢谢谢谢谢", "好"],                                      # truncation
    ["累", "了"],                                               # len 2 (tie)
    ["今天", "很", "好", "想", "说话"],                          # len 5
    ["我", "有点", "累"],                                       # len 3 (tie)
]
CORPUS_B = [
    ["说话", "了"],
    ["我", "很", "累", "了"],
    ["今天", "不", "好"],
    ["好", "好", "好", "好", "好"],
    ["想", "说话"],
]
CORPUS_C = [["我", "很", "高兴"], ["不", "想", "说话", "了"]]


def test_stateful_matches_oracle_across_batches(model_dir):
    """Stateful mode vs the upstream-semantics torch oracle, batch for
    batch: call 1 spans 3 consecutive uneven batches (4/4/2, shrink
    bookkeeping), call 2 expands the state store (5 > 4), call 3 slices
    it (2 < 5) — state carried across calls throughout, like the
    reference's single long-lived Embedder."""
    root, char_lex, word_lex, te, enc = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    pe.stateful = True
    oracle = _OracleStatefulElmo(te, enc, char_lex, word_lex)
    for sents, bs in ((CORPUS_A, 4), (CORPUS_B, 8), (CORPUS_C, 8)):
        got = pe.embed_sentences(sents, batch_size=bs)
        want = oracle.embed(sents, bs)
        assert got.shape == (len(sents), 2 * PROJ)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_stateful_first_call_matches_stateless(model_dir):
    """A fresh stateful embedder's very first batch starts from zeros —
    upstream's initial_states=None case — so it must equal the default
    zero-state mode."""
    root, *_ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    stateless = pe.embed_sentences(SENTS, batch_size=8)
    pe.stateful = True
    stateful = pe.embed_sentences(SENTS, batch_size=8)
    np.testing.assert_allclose(stateful, stateless, atol=1e-5)


def test_stateful_carryover_and_reset(model_dir):
    """Carried states change a repeated sentence's embedding (the
    corpus-order dependence the default mode removes); reset_states
    restores fresh-process behaviour exactly."""
    root, *_ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    pe.stateful = True
    first = pe.embed_sentences(CORPUS_C)
    second = pe.embed_sentences(CORPUS_C)
    assert np.abs(first - second).max() > 1e-6
    pe.reset_states()
    again = pe.embed_sentences(CORPUS_C)
    np.testing.assert_allclose(again, first, atol=1e-6)


def test_convert_char_only_tanh_variant(tmp_path):
    """Converter robustness beyond the zhs configuration: a released dir
    with NO word.dic (char-only token embedder) and tanh activation —
    the shape of several other ELMoForManyLangs language models — must
    convert and match a matching torch oracle."""
    torch.manual_seed(1)
    root = tmp_path / "xx.model"
    root.mkdir()
    char_lex = {t: i for i, t in enumerate(SPECIALS + CHARS)}
    with open(root / "char.dic", "w", encoding="utf-8") as f:
        for tok, i in char_lex.items():
            f.write(f"{tok}\t{i}\n")
    arch = {
        "encoder": {"name": "elmo", "projection_dim": PROJ, "dim": CELL,
                    "n_layers": 1, "cell_clip": 3, "proj_clip": 3},
        "token_embedder": {"name": "cnn", "activation": "tanh",
                           "filters": FILTERS, "n_highway": 1,
                           "word_dim": 0, "char_dim": CHAR_DIM,
                           "max_characters_per_token": MAX_CHARS},
    }
    (root / "config.json").write_text(json.dumps(arch))  # direct config
    te = {
        "char_emb_layer.embedding.weight":
            torch.randn(len(char_lex), CHAR_DIM),
        "projection.weight": torch.randn(PROJ, NFILT) * 0.3,
        "projection.bias": torch.randn(PROJ) * 0.1,
        "highways._layers.0.weight": torch.randn(2 * NFILT, NFILT) * 0.2,
        "highways._layers.0.bias": torch.randn(2 * NFILT) * 0.1,
    }
    for i, (w, out) in enumerate(FILTERS):
        te[f"convolutions.{i}.weight"] = torch.randn(out, CHAR_DIM, w) * 0.3
        te[f"convolutions.{i}.bias"] = torch.randn(out) * 0.1
    torch.save(te, root / "token_embedder.pkl")
    enc = {}
    for d in ("forward", "backward"):
        p = f"{d}_layer_0"
        enc[f"{p}.input_linearity.weight"] = torch.randn(4 * CELL,
                                                         PROJ) * 0.2
        enc[f"{p}.state_linearity.weight"] = torch.randn(4 * CELL,
                                                         PROJ) * 0.2
        enc[f"{p}.state_linearity.bias"] = torch.randn(4 * CELL) * 0.1
        enc[f"{p}.state_projection.weight"] = torch.randn(PROJ, CELL) * 0.2
    torch.save(enc, root / "encoder.pkl")

    pe = elmo_pretrained.convert_model_dir(root)
    assert pe.word_lexicon is None
    assert pe.char_cfg.activation == "tanh"
    got = pe.embed_sentences(SENTS[:2], batch_size=8)

    def oracle(sent):
        char_ids, _ = _oracle_ids(sent, char_lex, {"<oov>": 0})
        with torch.no_grad():
            # char-only, tanh: same conv/highway stack, no word concat
            x = te["char_emb_layer.embedding.weight"][char_ids]
            x = x.transpose(1, 2)
            convs = []
            for i in range(len(FILTERS)):
                y = F.conv1d(x, te[f"convolutions.{i}.weight"],
                             te[f"convolutions.{i}.bias"])
                y, _ = torch.max(y, dim=-1)
                convs.append(torch.tanh(y))
            h = torch.cat(convs, dim=-1)
            proj = h @ te["highways._layers.0.weight"].t() + \
                te["highways._layers.0.bias"]
            nonlinear = F.relu(proj[:, :NFILT])     # highways stay ReLU
            gate = torch.sigmoid(proj[:, NFILT:])
            h = gate * h + (1.0 - gate) * nonlinear
            emb = h @ te["projection.weight"].t() + te["projection.bias"]
            layer_reps = [torch.cat([emb, emb], dim=-1)]
            f_out, _, _ = _oracle_lstmp_dir(enc, "forward_layer_0", emb,
                                            CELL, PROJ)
            b_rev, _, _ = _oracle_lstmp_dir(enc, "backward_layer_0",
                                            torch.flip(emb, [0]), CELL,
                                            PROJ)
            layer_reps.append(torch.cat([f_out, torch.flip(b_rev, [0])],
                                        dim=-1))
            avg = torch.stack(layer_reps).mean(dim=0)
            return avg[1:-1].mean(dim=0).numpy()

    want = np.stack([oracle(s) for s in SENTS[:2]])
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_stateful_without_bundle_raises():
    """--elmo-stateful must not silently run the stateless PRNG encoder
    (and pay the per-speaker round-trip loop for nothing)."""
    from icassp2022_depression_tpu.frontend import text as text_fe

    with pytest.raises(ValueError, match="elmo_stateful"):
        text_fe.make_embedder(elmo_weights=None, elmo_stateful=True)


def test_batch_padding_invariance(model_dir):
    """Same sentence embedded alone and inside a longer-padded batch."""
    root, *_ = model_dir
    pe = elmo_pretrained.convert_model_dir(root)
    alone = pe.embed_sentences([SENTS[0]])
    batched = pe.embed_sentences(SENTS)
    np.testing.assert_allclose(alone[0], batched[0], atol=1e-5)
