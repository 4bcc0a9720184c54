"""Training-dynamics parity: the compiled fold program must track a torch
AdamW training loop step-for-step when given identical weights, data order,
and hyper-parameters.

Run in float64: Adam's first-step update is ``±lr * sign(grad)``, and the
reference's double-softmax loss makes gradients ~1e-4, so in float32 the
framework-vs-torch numerical noise (~1e-7 relative, different reduction
orders) flips gradient *signs* and the trajectories separate by design.
In float64 the signs are stable and the trajectories must coincide.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from icassp2022_depression_tpu import config as C

D, H, N, BS, EPOCHS = 16, 8, 16, 4, 8

CFG = C.replace(C.AUDIO_CLF.model, embedding_size=D, hidden_dims=H,
                dropout=0.0)
OPT = C.replace(C.AUDIO_CLF.optimizer, learning_rate=1e-3)


class TorchAudio(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(H, H),
                                              tnn.ReLU(inplace=True))
        self.lstm_net_audio = tnn.GRU(D, H, num_layers=2, batch_first=True)
        self.ln = tnn.LayerNorm(D)
        self.fc_audio = tnn.Sequential(
            tnn.Linear(H, H), tnn.ReLU(), tnn.Linear(H, 2),
            tnn.Softmax(dim=1))

    def forward(self, x):
        x = self.ln(x)
        x, _ = self.lstm_net_audio(x)
        return self.fc_audio(x.mean(dim=1))


def test_fold_program_tracks_torch_adamw():
    with jax.enable_x64(True):
        from icassp2022_depression_tpu.models import audio_net, porting
        from icassp2022_depression_tpu.ops.nn import (
            masked_cross_entropy_on_probs,
        )
        from icassp2022_depression_tpu.train import loop, optim

        torch.manual_seed(0)
        m = TorchAudio().double()
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        sd = {k.replace("fc_audio.0.", "fc_audio.1.")
               .replace("fc_audio.2.", "fc_audio.4."): v
              for k, v in sd.items()}
        params = porting.audio_net_from_state_dict(sd, CFG)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)

        rng = np.random.default_rng(0)
        y_np = (rng.random(N) < 0.5).astype(np.int64)
        x_np = (np.where(y_np[:, None, None] == 1, .4, -.4) +
                rng.standard_normal((N, 3, D)))

        # ---- torch side: reference-style loop (double precision)
        groups = [
            {"params": [p for n, p in m.named_parameters() if "ln" not in n],
             "weight_decay": 1e-5},
            {"params": [p for n, p in m.named_parameters() if "ln" in n],
             "weight_decay": 0.0},
        ]
        opt = torch.optim.AdamW(groups, lr=OPT.learning_rate)
        crit = tnn.CrossEntropyLoss()
        torch_losses = []
        for _ in range(EPOCHS):
            total = 0.0
            for i in range(0, N, BS):
                xb = torch.from_numpy(x_np[i:i + BS])
                yb = torch.from_numpy(y_np[i:i + BS])
                opt.zero_grad()
                loss = crit(m(xb), yb)
                loss.backward()
                opt.step()
                total += loss.item()
            torch_losses.append(total)

        # ---- our side: compiled fold program, same order
        def train_loss(p, xs, y, mask, key):
            pred = audio_net.apply(p, CFG, xs[0], train=True, key=key)
            return masked_cross_entropy_on_probs(
                pred, y.astype(jnp.int32), mask, 2), pred

        def eval_fn(p, xs):
            return audio_net.apply(p, CFG, xs[0], train=False)

        optimizer = optim.build(OPT, params)
        run = loop.make_fold_runner(train_loss, eval_fn, optimizer,
                                    "classification", C.AUDIO_CLF.gate,
                                    epochs=EPOCHS + 1, jit=False)
        data = loop.make_fold_data([x_np], y_np, [x_np[:4]], y_np[:4], BS)
        data = loop.FoldData(
            train_x=tuple(a.astype(jnp.float64) for a in data.train_x),
            train_y=data.train_y, train_mask=data.train_mask,
            test_x=tuple(a.astype(jnp.float64) for a in data.test_x),
            test_y=data.test_y, test_mask=data.test_mask)
        final_params, _, _, _, logs = jax.jit(run)(
            params, optimizer.init(params), data, jax.random.PRNGKey(0))

        np.testing.assert_allclose(np.asarray(logs["loss"]), torch_losses,
                                   rtol=1e-8, atol=1e-8)

        # final parameters agree leaf-for-leaf after 32 optimizer steps
        final_sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        final_sd = {k.replace("fc_audio.0.", "fc_audio.1.")
                     .replace("fc_audio.2.", "fc_audio.4."): v
                    for k, v in final_sd.items()}
        want = porting.audio_net_from_state_dict(final_sd, CFG)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(final_params)[0],
                jax.tree_util.tree_flatten_with_path(want)[0]):
            path = "/".join(str(getattr(p, "key", p)) for p in pa)
            if path.startswith("attn"):
                # the unused attention block: torch never steps it (no
                # grads -> skipped), optax applies decoupled weight decay
                # to its zero-grad leaves — a documented no-op-level
                # difference (the block is dead code in the forward)
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, err_msg=path)
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=path)
