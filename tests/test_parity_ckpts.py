"""parity --ckpt-dir: checkpoint-driven acceptance on a reference Model/
tree (mixed released-style ``.pt`` whole-module pickles and our ``.npz``),
no training involved."""

import json
from pathlib import Path

import numpy as np
import jax
import torch
import torch.nn as tnn

from icassp2022_depression_tpu import cli
from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.models import audio_net, fusion, text_net
from icassp2022_depression_tpu.train import checkpoints


def test_discovery_layout_and_best_metric(tmp_path):
    model = tmp_path / "Model"
    aud = model / "ClassificationWhole" / "Audio"
    aud.mkdir(parents=True)
    # two gated saves for fold 1 -> the higher F1 wins (the file the
    # reference's checking scripts would hardcode)
    for name in ("BiLSTM_gru_vlad256_256_0.55_1.pt",
                 "BiLSTM_gru_vlad256_256_0.67_1.pt",
                 "BiLSTM_gru_vlad256_256_0.67_2.pt",
                 "BiLSTM_gru_vlad256_256_0.63_3.pt"):
        (aud / name).write_bytes(b"x")
    # text clf: only 2 folds -> skipped with a warning
    txt = model / "ClassificationWhole" / "Text"
    txt.mkdir(parents=True)
    for name in ("BiLSTM_128_0.64_1.pt", "BiLSTM_128_0.66_2.pt"):
        (txt / name).write_bytes(b"x")
    # regression: fold in the parent dir, two saves -> lower MAE wins
    for fold, names in ((1, ("gru_vlad256_256_8.90.pt",
                             "gru_vlad256_256_7.60.pt")),
                        (2, ("gru_vlad256_256_8.38.pt",)),
                        (3, ("gru_vlad256_256_8.25.npz",))):
        d = model / "Regression" / f"Audio{fold}"
        d.mkdir(parents=True)
        for name in names:
            (d / name).write_bytes(b"x")
    found = cli._discover_reference_ckpts(model)
    assert set(found) == {"audio_clf", "audio_reg"}
    assert found["audio_clf"][0].name == "BiLSTM_gru_vlad256_256_0.67_1.pt"
    assert [p.name for p in found["audio_reg"]] == [
        "gru_vlad256_256_7.60.pt", "gru_vlad256_256_8.38.pt",
        "gru_vlad256_256_8.25.npz"]


class _RefAudioClfFull(tnn.Module):
    """Full-geometry reference AudioBiLSTM (audio_gru_whole.py:24-108)."""

    def __init__(self, d=256, h=256):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(h, h),
                                              tnn.ReLU(inplace=True))
        self.lstm_net_audio = tnn.GRU(d, h, num_layers=2, batch_first=True)
        self.ln = tnn.LayerNorm(d)
        self.fc_audio = tnn.Sequential(
            tnn.Dropout(0.5), tnn.Linear(h, h), tnn.ReLU(),
            tnn.Dropout(0.5), tnn.Linear(h, 2), tnn.Softmax(dim=1))


def test_parity_ckpt_dir_end_to_end(tmp_path, capsys):
    """Full loop: features npz + a mixed .pt/.npz Model/ tree -> parity
    --ckpt-dir prints a report covering every discovered task and the
    acceptance table."""
    rng = np.random.default_rng(0)
    n = 16
    y = (rng.random(n) < 0.4).astype(np.int64)
    sds = np.where(y == 1, 60.0, 40.0).astype(np.float32)
    xa = (np.where(y[:, None, None, None] == 1, .5, -.5) +
          rng.standard_normal((n, 3, 1, 256))).astype(np.float32)
    xt = rng.standard_normal((n, 3, 1024)).astype(np.float32)
    adir = tmp_path / "Features" / "AudioWhole"
    tdir = tmp_path / "Features" / "TextWhole"
    adir.mkdir(parents=True)
    tdir.mkdir(parents=True)
    for track, labels in (("clf", y), ("reg", sds)):
        np.savez(adir / f"whole_samples_{track}_256.npz", xa)
        np.savez(adir / f"whole_labels_{track}_256.npz", labels)
        np.savez(tdir / f"whole_samples_{track}_avg.npz", xt)
        np.savez(tdir / f"whole_labels_{track}_avg.npz", labels)

    model = tmp_path / "Model"
    # audio clf: released-style whole-module .pt pickles
    aud = model / "ClassificationWhole" / "Audio"
    aud.mkdir(parents=True)
    for fold in (1, 2, 3):
        torch.manual_seed(fold)
        torch.save(_RefAudioClfFull(),
                   aud / f"BiLSTM_gru_vlad256_256_0.6{fold}_{fold}.pt")
    # text clf + fuse clf + the reg tasks: our npz checkpoints in the
    # reference tree layout
    txt = model / "ClassificationWhole" / "Text"
    txt.mkdir(parents=True)
    fus = model / "ClassificationWhole" / "Fuse"
    fus.mkdir(parents=True)
    for fold in (1, 2, 3):
        checkpoints.save(txt / f"BiLSTM_128_0.6{fold}_{fold}",
                         text_net.init(jax.random.PRNGKey(fold),
                                       C.TEXT_CLF.model))
        checkpoints.save(fus / f"fuse_0.6{fold}_{fold}",
                         fusion.init(jax.random.PRNGKey(fold), C.FUSE_CLF))
        for kind, mod, cfg in (("Audio", audio_net, C.AUDIO_REG.model),
                               ("Text", text_net, C.TEXT_REG.model)):
            d = model / "Regression" / f"{kind}{fold}"
            d.mkdir(parents=True)
            checkpoints.save(
                d / f"ref_{fold}_8.2{fold}",
                mod.init(jax.random.PRNGKey(10 + fold), cfg))
        d = model / "Regression" / f"Fuse{fold}"
        d.mkdir(parents=True)
        checkpoints.save(d / f"fuse_8.2{fold}",
                         fusion.init(jax.random.PRNGKey(20 + fold),
                                     C.FUSE_REG))

    rc = cli.main(["parity", "--ckpt-dir", str(model), "--root",
                   str(tmp_path), "--seed", "0"])
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[0])
    assert set(report) == {"audio_f1", "text_f1", "fuse_f1",
                           "audio_mae", "text_mae", "fuse_mae"}
    assert all(len(v) == 3 for v in report.values())
    # random/untrained checkpoints are not expected to hit the bands —
    # what matters is that every metric was computed and the table printed
    assert any("| Metric |" in l for l in out)
    assert out[-1].startswith("PARITY: ")
    assert rc in (0, 1)

    # the .pt fold metrics equal a direct torch-forward check
    from icassp2022_depression_tpu.data import folds as F
    from icassp2022_depression_tpu.eval import checking
    tf_idx = F.generate_clf_folds(y, 3, seed=0)
    res, _ = checking.check_audio_clf(
        np.squeeze(xa, 2), y, tf_idx,
        [aud / f"BiLSTM_gru_vlad256_256_0.6{f}_{f}.pt" for f in (1, 2, 3)])
    np.testing.assert_equal(report["audio_f1"], [r["f1"] for r in res])
