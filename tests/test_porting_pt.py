"""Loading the reference's whole-module ``.pt`` checkpoints.

The reference's only training artifact is ``torch.save(model)`` of the
entire module (``Classification/audio_gru_whole.py:125``); its eval
harnesses ``torch.load`` those pickles directly
(``Classification/FuseModelChecking.py:100``).  These tests prove
``models.porting.load_reference_pt`` ingests exactly that artifact shape —
including when the defining class lives only in a dead script's
``__main__`` — without ever executing pickled code, and that the
extension-dispatched paths (``eval.checking``, ``cli check --ckpts x.pt``,
``serve.Predictor.from_checkpoint``) reproduce the torch forward.
"""

import json
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.eval import checking
from icassp2022_depression_tpu.models import audio_net, porting, text_net
from icassp2022_depression_tpu.train import checkpoints


class _RefAudioClf(tnn.Module):
    """Reference AudioBiLSTM layout (audio_gru_whole.py:24-108 key names)."""

    def __init__(self, d=32, h=16):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(h, h),
                                              tnn.ReLU(inplace=True))
        self.lstm_net_audio = tnn.GRU(d, h, num_layers=2, batch_first=True)
        self.ln = tnn.LayerNorm(d)
        self.fc_audio = tnn.Sequential(
            tnn.Dropout(0.5), tnn.Linear(h, h), tnn.ReLU(),
            tnn.Dropout(0.5), tnn.Linear(h, 2), tnn.Softmax(dim=1))

    def forward(self, x):
        x = self.ln(x)
        x, _ = self.lstm_net_audio(x)
        return self.fc_audio(x.mean(dim=1))


class _RefTextClf(tnn.Module):
    """Reference TextBiLSTM layout (text_bilstm_whole.py key names)."""

    def __init__(self, d=24, h=8):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(h, h),
                                              tnn.ReLU(inplace=True))
        self.lstm_net = tnn.LSTM(d, h, num_layers=2, bidirectional=True)
        self.fc_out = tnn.Sequential(
            tnn.Linear(h, h), tnn.ReLU(), tnn.Dropout(0.5),
            tnn.Linear(h, 2), tnn.Softmax(dim=1))
        self.ln1 = tnn.LayerNorm(d)
        self.ln2 = tnn.LayerNorm(h)

    def forward(self, x):
        xt = x.permute(1, 0, 2)
        out, (h_n, _) = self.lstm_net(xt)
        out = out.permute(1, 0, 2)
        h_n = h_n.permute(1, 0, 2)
        half = out.shape[-1] // 2
        h = out[..., :half] + out[..., half:]
        q = h_n.sum(dim=1, keepdim=True)
        aw = torch.relu(self.attention_layer[0](q))
        scores = torch.softmax(torch.bmm(aw, torch.tanh(h).transpose(1, 2)),
                               dim=-1)
        ctx = torch.bmm(scores, h).squeeze(1)
        return self.fc_out(ctx)


class _RefFusion(tnn.Module):
    """Reference fusion_net layout (fuse_net_whole.py:245-308 key names)."""

    def __init__(self, ae=12, te=20, ah=8, th=8):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(th, th),
                                              tnn.ReLU(inplace=True))
        self.lstm_net = tnn.LSTM(te, th, num_layers=2, bidirectional=True)
        self.fc_out = tnn.Sequential(tnn.Dropout(0.0), tnn.Linear(th, th),
                                     tnn.ReLU(), tnn.Dropout(0.0))
        self.lstm_net_audio = tnn.GRU(ae, ah, num_layers=2, batch_first=True)
        self.fc_audio = tnn.Sequential(tnn.Dropout(0.0), tnn.Linear(ah, ah),
                                       tnn.ReLU(), tnn.Dropout(0.0))
        self.ln = tnn.LayerNorm(ae)
        self.modal_attn = tnn.Linear(th + ah, th + ah, bias=False)
        self.fc_final = tnn.Sequential(tnn.Linear(th + ah, 2, bias=False),
                                       tnn.Softmax(dim=1))


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# -- the core claim: a dead script's __main__ class is loadable ------------

_SAVE_SCRIPT = r"""
import numpy as np
import torch
import torch.nn as tnn

class AudioBiLSTM(tnn.Module):
    def __init__(self, d=32, h=16):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(h, h),
                                              tnn.ReLU(inplace=True))
        self.lstm_net_audio = tnn.GRU(d, h, num_layers=2, batch_first=True)
        self.ln = tnn.LayerNorm(d)
        self.fc_audio = tnn.Sequential(
            tnn.Dropout(0.5), tnn.Linear(h, h), tnn.ReLU(),
            tnn.Dropout(0.5), tnn.Linear(h, 2), tnn.Softmax(dim=1))

torch.manual_seed(7)
m = AudioBiLSTM()
# exactly audio_gru_whole.py:125: torch.save of the WHOLE module, from a
# top-level script (class pickles as __main__.AudioBiLSTM)
torch.save(m, OUT + "/ref_whole.pt")
np.savez(OUT + "/expected_sd.npz",
         **{k: v.detach().numpy() for k, v in m.state_dict().items()})
"""


def test_whole_module_pt_loads_without_the_defining_class(tmp_path):
    """The artifact's class exists only in a finished subprocess's
    ``__main__`` — precisely a migrating user's situation (the reference
    script is gone; only the pickle remains)."""
    script = f"OUT = {str(tmp_path)!r}\n" + _SAVE_SCRIPT
    subprocess.run([sys.executable, "-c", script], check=True,
                   env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                        "HOME": "/root"})
    sd = porting.load_reference_pt(tmp_path / "ref_whole.pt")
    with np.load(tmp_path / "expected_sd.npz") as want:
        assert set(sd) == set(want.files)
        for k in want.files:
            np.testing.assert_array_equal(sd[k], want[k])


def test_audio_whole_module_pt_forward_parity(tmp_path):
    torch.manual_seed(0)
    m = _RefAudioClf()
    torch.save(m, tmp_path / "a.pt")
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=32, hidden_dims=16)
    params = porting.params_from_reference_pt(tmp_path / "a.pt", "audio", cfg)
    x = np.random.default_rng(0).standard_normal((5, 3, 32)).astype(np.float32)
    m.eval()
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(audio_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_text_whole_module_pt_forward_parity(tmp_path):
    torch.manual_seed(1)
    m = _RefTextClf()
    torch.save(m, tmp_path / "t.pt")
    cfg = C.replace(C.TEXT_CLF.model, embedding_size=24, hidden_dims=8)
    params = porting.params_from_reference_pt(tmp_path / "t.pt", "text", cfg)
    x = np.random.default_rng(1).standard_normal((4, 3, 24)).astype(np.float32)
    m.eval()
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(text_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fusion_whole_module_pt_matches_state_dict_mapping(tmp_path):
    torch.manual_seed(2)
    m = _RefFusion()
    torch.save(m, tmp_path / "f.pt")
    fcfg = C.replace(C.FUSE_CLF, audio_embed_size=12, text_embed_size=20,
                     audio_hidden_dims=8, text_hidden_dims=8)
    got = porting.params_from_reference_pt(tmp_path / "f.pt", "fusion", fcfg)
    want = porting.fusion_from_state_dict(_sd(m), fcfg)
    jax.tree_util.tree_map(np.testing.assert_array_equal, got, want)


def test_state_dict_pt_also_loads(tmp_path):
    torch.manual_seed(3)
    m = _RefAudioClf()
    torch.save(m.state_dict(), tmp_path / "sd.pt")
    sd = porting.load_reference_pt(tmp_path / "sd.pt")
    want = _sd(m)
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k])


def test_pickled_callables_never_execute(tmp_path):
    """A hostile/arbitrary pickle must come back inert: globals outside the
    tensor-rebuild allowlist resolve to shims, so nothing runs."""
    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, (f"touch {marker}",))

    with open(tmp_path / "evil.pt", "wb") as f:
        # raw pickle stream (legacy torch format starts the same way for
        # the attacker-controlled payload portion)
        pickle.dump({"payload": Evil()}, f)
    try:
        porting.load_reference_pt(tmp_path / "evil.pt")
    except Exception:
        pass  # rejection is fine — execution is not
    assert not marker.exists(), "pickled os.system call was executed!"


def test_allowed_module_callables_never_execute(tmp_path):
    """Callables living in the allowlisted MODULES (numpy, torch
    internals) must still shim unless their NAME is allowlisted — pickle
    REDUCE calls whatever find_class returns with attacker-chosen args,
    so `numpy.load`/`torch.serialization.load` resolving for real would
    be arbitrary file ingestion / recursive unrestricted unpickling."""
    import io

    for module, name in (("numpy", "load"),
                         ("torch.serialization", "load"),
                         ("numpy.f2py", "compile"),
                         ("torch._utils", "classproperty")):
        # hand-built stream: GLOBAL module.name; one string arg that would
        # error loudly if the real callable ran (missing file /
        # not-a-stream); TUPLE1; REDUCE; STOP
        payload = (b"\x80\x02"
                   + b"c" + module.encode() + b"\n" + name.encode() + b"\n"
                   + b"X\x14\x00\x00\x00/definitely/missing_"
                   + b"\x85R.")
        obj = porting._SafeRefUnpickler(io.BytesIO(payload)).load()
        assert isinstance(obj, porting._ShimBase), (
            f"{module}.{name} resolved for real — REDUCE executed it")


def test_checkpoints_load_rejects_pt_with_pointer(tmp_path):
    (tmp_path / "x.pt").write_bytes(b"")
    with pytest.raises(ValueError, match="porting"):
        checkpoints.load(tmp_path / "x.pt")


# -- dispatched surfaces ----------------------------------------------------


def _clf_data(seed=0, n=24, d=32):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.4).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .6, -.6) +
         rng.standard_normal((n, 3, d))).astype(np.float32)
    return x, y


def test_checking_accepts_pt_paths(tmp_path):
    """check_audio_clf fed .pt paths == fed the equivalent ported params."""
    x, y = _clf_data()
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=32, hidden_dims=16)
    paths, params = [], []
    for i in range(3):
        torch.manual_seed(10 + i)
        m = _RefAudioClf()
        p = tmp_path / f"BiLSTM_gru_vlad32_16_0.6{i}_{i + 1}.pt"
        torch.save(m, p)
        paths.append(p)
        params.append(porting.audio_net_from_state_dict(_sd(m), cfg))
    r_pt, s_pt = checking.check_audio_clf(x, y, tf_idx, paths, cfg)
    r_mem, s_mem = checking.check_audio_clf(x, y, tf_idx, params, cfg)
    for k in s_pt:
        np.testing.assert_equal(s_pt[k], s_mem[k])


def test_cli_check_accepts_pt(tmp_path, capsys):
    """The VERDICT acceptance loop: torch.save whole modules exactly as the
    reference does, then ``cli check --ckpts x.pt`` reproduces the torch
    forward's fold metrics (full-size 256/256 AudioBiLSTM geometry)."""
    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu.eval import metrics as M

    rng = np.random.default_rng(5)
    n = 16
    y = (rng.random(n) < 0.4).astype(np.int64)
    x = (np.where(y[:, None, None, None] == 1, .5, -.5) +
         rng.standard_normal((n, 3, 1, 256))).astype(np.float32)
    out = tmp_path / "Features" / "AudioWhole"
    out.mkdir(parents=True)
    np.savez(out / "whole_samples_clf_256.npz", x)
    np.savez(out / "whole_labels_clf_256.npz", y)

    paths, models = [], []
    for i in range(3):
        torch.manual_seed(20 + i)
        m = _RefAudioClf(d=256, h=256)
        m.eval()
        p = tmp_path / f"BiLSTM_gru_vlad256_256_0.6{i}_{i + 1}.pt"
        torch.save(m, p)
        paths.append(str(p))
        models.append(m)
    rc = cli.main(["check", "--task", "audio_clf", "--root", str(tmp_path),
                   "--ckpts"] + paths + ["--seed", "0"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip()
             .splitlines() if l.startswith("{")]
    fold_rows = [l for l in lines if "fold" in l]
    assert len(fold_rows) == 3

    # torch-forward oracle over the same recomputed splits
    from icassp2022_depression_tpu.data import augment

    xs = np.squeeze(x, axis=2)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    dep, non = np.where(y == 1)[0], np.where(y == 0)[0]
    for fold, tr_idx in enumerate(tf_idx):
        _, (xte, yte) = augment.augment_classification_fold(
            [xs], y, tr_idx, dep, non)
        with torch.no_grad():
            probs = models[fold](torch.from_numpy(xte[0])).numpy()
        cm = M.standard_confusion_matrix(yte, np.argmax(probs, axis=-1))
        want = M.classification_metrics(cm)
        got = fold_rows[fold]
        for k in ("precision", "recall", "f1", "accuracy"):
            np.testing.assert_allclose(got[k], want[k], atol=1e-6,
                                       err_msg=f"fold {fold} {k}")


# -- reverse direction: our trained params -> reference-harness .pt ---------


def test_export_audio_pt_loads_in_reference_module_strict(tmp_path):
    """A model trained HERE runs in the reference's torch harness: our
    params export as a reference-layout state dict that a reference-shaped
    module accepts under strict=True, with forward parity."""
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=32, hidden_dims=16)
    params = audio_net.init(jax.random.PRNGKey(0), cfg)
    porting.export_reference_pt(params, "audio", cfg, tmp_path / "out.pt")
    m = _RefAudioClf()
    m.load_state_dict(torch.load(tmp_path / "out.pt", weights_only=True),
                      strict=True)
    m.eval()
    x = np.random.default_rng(3).standard_normal((5, 3, 32)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(audio_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_text_pt_loads_in_reference_module_strict(tmp_path):
    cfg = C.replace(C.TEXT_CLF.model, embedding_size=24, hidden_dims=8)
    params = text_net.init(jax.random.PRNGKey(1), cfg)
    porting.export_reference_pt(params, "text", cfg, tmp_path / "out.pt")
    m = _RefTextClf()
    m.load_state_dict(torch.load(tmp_path / "out.pt", weights_only=True),
                      strict=True)
    m.eval()
    x = np.random.default_rng(4).standard_normal((4, 3, 24)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(text_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_fusion_pt_round_trips(tmp_path):
    """export -> strict load into the reference fusion layout -> re-import
    through the forward mapper reproduces the original tree bit-exactly."""
    from icassp2022_depression_tpu.models import fusion

    fcfg = C.replace(C.FUSE_CLF, audio_embed_size=12, text_embed_size=20,
                     audio_hidden_dims=8, text_hidden_dims=8)
    params = fusion.init(jax.random.PRNGKey(2), fcfg)
    porting.export_reference_pt(params, "fusion", fcfg, tmp_path / "f.pt")
    m = _RefFusion()
    m.load_state_dict(torch.load(tmp_path / "f.pt", weights_only=True),
                      strict=True)
    back = porting.fusion_from_state_dict(_sd(m), fcfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)


def test_export_import_round_trip_via_loader(tmp_path):
    """export_reference_pt artifacts also feed our own .pt ingestion path
    (load_reference_pt treats a state-dict pickle as first-class)."""
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=32, hidden_dims=16)
    params = audio_net.init(jax.random.PRNGKey(5), cfg)
    want = porting.export_reference_pt(params, "audio", cfg,
                                       tmp_path / "rt.pt")
    sd = porting.load_reference_pt(tmp_path / "rt.pt")
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k])


def test_cli_export_pt_npz_to_reference_harness(tmp_path, capsys):
    """Full reverse-migration loop: our .npz checkpoint -> ``cli export-pt``
    -> strict load_state_dict into the reference module at the preset
    geometry -> torch forward matches our apply."""
    from icassp2022_depression_tpu import cli

    cfg = C.AUDIO_CLF.model  # preset 256/256 geometry
    params = audio_net.init(jax.random.PRNGKey(9), cfg)
    npz = checkpoints.save(tmp_path / "ours", params)
    rc = cli.main(["export-pt", "--task", "audio_clf", "--ckpt", str(npz),
                   "--out", str(tmp_path / "ref.pt")])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["tensors"] > 0 and line["kind"] == "audio"
    m = _RefAudioClf(d=cfg.embedding_size, h=cfg.hidden_dims)
    m.load_state_dict(torch.load(tmp_path / "ref.pt", weights_only=True),
                      strict=True)
    m.eval()
    x = np.random.default_rng(6).standard_normal(
        (2, 3, cfg.embedding_size)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(audio_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_predictor_from_checkpoint_pt(tmp_path):
    from icassp2022_depression_tpu import serve

    torch.manual_seed(4)
    m = _RefAudioClf()
    m.eval()
    torch.save(m, tmp_path / "served.pt")
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=32, hidden_dims=16)
    pred = serve.Predictor.from_checkpoint(tmp_path / "served.pt",
                                           "audio_clf", model_cfg=cfg)
    x = np.random.default_rng(2).standard_normal((3, 3, 32)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = pred.predict_features(audio_feats=x)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("task", ["audio_clf", "audio_reg", "text_clf",
                                  "text_reg", "fuse_clf", "fuse_reg"])
def test_export_import_inverse_all_six_tasks(tmp_path, task):
    """export_reference_pt and the *_from_state_dict importers are exact
    inverses for EVERY task layout — the reg variants differ from clf in
    head Sequential indices (``head_input_dropout``), LayerNorm presence
    (``input_layernorm``/``audio_layernorm``) and the fusion per-fold
    geometry, so each pins a distinct key map."""
    from icassp2022_depression_tpu.models import fusion

    key = jax.random.PRNGKey(["audio_clf", "audio_reg", "text_clf",
                              "text_reg", "fuse_clf", "fuse_reg"].index(task))
    if task.startswith("fuse"):
        cfg = C.replace(C.FUSE_CLF if task == "fuse_clf" else C.FUSE_REG,
                        audio_embed_size=12, text_embed_size=20,
                        audio_hidden_dims=8, text_hidden_dims=8)
        kind, params = "fusion", fusion.init(key, cfg)
    else:
        base = {"audio_clf": C.AUDIO_CLF, "audio_reg": C.AUDIO_REG,
                "text_clf": C.TEXT_CLF, "text_reg": C.TEXT_REG}[task].model
        cfg = C.replace(base, embedding_size=24, hidden_dims=8)
        kind = task.split("_")[0]
        params = (audio_net if kind == "audio" else text_net).init(key, cfg)
    porting.export_reference_pt(params, kind, cfg, tmp_path / "x.pt")
    back = porting.params_from_reference_pt(tmp_path / "x.pt", kind, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=task),
        params, back)
