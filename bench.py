"""Benchmark: audio-classifier training epoch time, TPU vs the reference's
CPU design.

Headline path (BASELINE.md): the audio GRU classifier trained with the full
reference configuration (batch 8, AdamW, CE, 169 epochs, per-epoch
full-batch eval + metric gating) on EATD-scale data (162 speakers, 3x256
features, permutation-augmented folds).

* TPU side: the framework's compiled whole-fold program — per-epoch time
  measured over complete folds (including per-epoch eval + gating).
* Baseline: the same training epoch implemented the reference's way
  (PyTorch modules, Python minibatch loop, CPU) measured on this machine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def make_data(seed=0, n=162, n_dep=30, dim=256):
    rng = np.random.default_rng(seed)
    targets = np.zeros(n, np.int64)
    targets[rng.choice(n, n_dep, replace=False)] = 1
    sign = np.where(targets[:, None, None] == 1, 0.3, -0.3)
    features = (sign + rng.standard_normal((n, 3, dim))).astype(np.float32)
    return features, targets


def bench_tpu(features, targets):
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import folds
    from icassp2022_depression_tpu.train import trainers

    train_folds = folds.generate_clf_folds(targets, 3, seed=0)
    # fold 1: compile + run (discarded); folds 2,3: steady state
    t0 = time.time()
    trainers.train_audio_clf(features, targets, train_folds[:1],
                             C.AUDIO_CLF, seed=0)
    compile_and_first = time.time() - t0
    t0 = time.time()
    trainers.train_audio_clf(features, targets, train_folds[1:],
                             C.AUDIO_CLF, seed=0)
    steady = time.time() - t0
    n_epochs = 2 * (C.AUDIO_CLF.epochs - 1)
    return steady / n_epochs * 1000.0, compile_and_first


def bench_torch_baseline(features, targets, n_epochs=6):
    """The reference's training-epoch structure: torch modules, Python
    minibatch loop, CPU, full-batch eval each epoch."""
    import torch
    import torch.nn as nn

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import augment, folds

    torch.set_num_threads(max(1, (__import__("os").cpu_count() or 1)))

    class AudioNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention_layer = nn.Sequential(nn.Linear(256, 256),
                                                 nn.ReLU(inplace=True))
            self.rnn = nn.GRU(256, 256, num_layers=2, dropout=0.5,
                              batch_first=True)
            self.ln = nn.LayerNorm(256)
            self.head = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(256, 256), nn.ReLU(),
                nn.Dropout(0.5), nn.Linear(256, 2), nn.Softmax(dim=1))

        def forward(self, x):
            x = self.ln(x)
            x, _ = self.rnn(x)
            return self.head(x.mean(dim=1))

    train_folds = folds.generate_clf_folds(targets, 3, seed=0)
    dep = np.where(targets == 1)[0]
    non = np.where(targets == 0)[0]
    (xtr_l, ytr), (xte_l, yte) = augment.augment_classification_fold(
        [features], targets, train_folds[0], dep, non)
    xtr, xte = xtr_l[0], xte_l[0]

    model = AudioNet()
    groups = [
        {"params": [p for n_, p in model.named_parameters() if "ln" not in n_],
         "weight_decay": 1e-5},
        {"params": [p for n_, p in model.named_parameters() if "ln" in n_],
         "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=6e-6)
    crit = nn.CrossEntropyLoss()
    bs = C.AUDIO_CLF.batch_size
    xt = torch.from_numpy(xtr)
    yt = torch.from_numpy(ytr)
    xe = torch.from_numpy(xte)
    ye = torch.from_numpy(yte)

    t0 = time.time()
    for _ in range(n_epochs):
        model.train()
        for i in range(0, len(xt), bs):
            xb, yb = xt[i:i + bs], yt[i:i + bs]
            opt.zero_grad()
            out = model(xb)
            loss = crit(out, yb)
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            pred = model(xe).argmax(dim=1)
            (pred == ye).float().mean()
    return (time.time() - t0) / n_epochs * 1000.0


def main():
    features, targets = make_data()
    tpu_ms, compile_s = bench_tpu(features, targets)
    torch_ms = bench_torch_baseline(features, targets)
    result = {
        "metric": "audio_clf_train_epoch_time",
        "value": round(tpu_ms, 2),
        "unit": "ms/epoch",
        "vs_baseline": round(torch_ms / tpu_ms, 2),
    }
    print(json.dumps(result))
    print(f"# torch-cpu baseline: {torch_ms:.1f} ms/epoch; "
          f"tpu compile+first-fold: {compile_s:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
