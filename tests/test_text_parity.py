"""Text-trainer trajectory parity vs torch: BiLSTM + additive attention +
AdamW param groups must track loss-for-loss in float64 (completing the
trajectory-parity set: audio in test_optim_parity, fusion in
test_fusion_parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from icassp2022_depression_tpu import config as C

D, H, N, BS, EPOCHS = 24, 8, 12, 4, 6

CFG = C.replace(C.TEXT_CLF.model, embedding_size=D, hidden_dims=H,
                dropout=0.0)
OPT = C.replace(C.TEXT_CLF.optimizer, learning_rate=1e-3)


class TorchText(tnn.Module):
    """Reference TextBiLSTM layout (text_bilstm_whole.py key names),
    dropout 0 so no RNG is shared."""

    def __init__(self):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(H, H),
                                              tnn.ReLU(inplace=True))
        self.lstm_net = tnn.LSTM(D, H, num_layers=2, bidirectional=True)
        self.fc_out = tnn.Sequential(tnn.Linear(H, H), tnn.ReLU(),
                                     tnn.Dropout(0.0), tnn.Linear(H, 2),
                                     tnn.Softmax(dim=1))
        self.ln1 = tnn.LayerNorm(D)
        self.ln2 = tnn.LayerNorm(H)

    def forward(self, x):
        xt = x.permute(1, 0, 2)
        out, (h_n, _) = self.lstm_net(xt)
        out = out.permute(1, 0, 2)
        h_n = h_n.permute(1, 0, 2)
        half = out.shape[-1] // 2
        h = out[..., :half] + out[..., half:]
        q = h_n.sum(dim=1, keepdim=True)
        aw = torch.relu(self.attention_layer[0](q))
        sm = torch.softmax(torch.bmm(aw, torch.tanh(h).transpose(1, 2)),
                           dim=-1)
        ctx = torch.bmm(sm, h).squeeze(1)
        return self.fc_out(ctx)


def test_text_fold_program_tracks_torch_adamw():
    with jax.enable_x64(True):
        from icassp2022_depression_tpu.models import porting, text_net
        from icassp2022_depression_tpu.ops.nn import (
            masked_cross_entropy_on_probs,
        )
        from icassp2022_depression_tpu.train import loop, optim

        torch.manual_seed(0)
        m = TorchText().double()
        # the clf text head names its Linears fc_out.0/.3 (no input
        # Dropout); CFG.head_input_dropout=False matches -> porting indices
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params = porting.text_net_from_state_dict(sd, CFG)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.array(a, copy=True), jnp.float64),
            params)

        rng = np.random.default_rng(0)
        y_np = (rng.random(N) < 0.5).astype(np.int64)
        x_np = (np.where(y_np[:, None, None] == 1, .4, -.4) +
                rng.standard_normal((N, 3, D)))

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

        def train_loss(p, xs, y, mask, key):
            pred = text_net.apply(p, CFG, xs[0], train=True, key=key)
            return masked_cross_entropy_on_probs(
                pred, y.astype(jnp.int32), mask, 2), pred

        def eval_fn(p, xs):
            return text_net.apply(p, CFG, xs[0], train=False)

        optimizer = optim.build(OPT, params)
        run = loop.make_fold_runner(train_loss, eval_fn, optimizer,
                                    "classification", C.TEXT_CLF.gate,
                                    epochs=EPOCHS + 1, jit=False)
        data = loop.make_fold_data([x_np], y_np, [x_np[:4]], y_np[:4], BS)
        data = loop.FoldData(
            train_x=tuple(a.astype(jnp.float64) for a in data.train_x),
            train_y=data.train_y, train_mask=data.train_mask,
            test_x=tuple(a.astype(jnp.float64) for a in data.test_x),
            test_y=data.test_y, test_mask=data.test_mask)
        _, _, _, _, logs = jax.jit(run)(params, optimizer.init(params), data,
                                        jax.random.PRNGKey(0))

        np.testing.assert_allclose(np.asarray(logs["loss"]), torch_losses,
                                   rtol=1e-8, atol=1e-8)
