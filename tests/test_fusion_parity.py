"""Fusion-trainer trajectory parity vs torch: frozen no_grad branches,
MyLoss on the fc_final column split, Adam on only-fc_final — the trickiest
reference semantics — must track loss-for-loss in float64."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from icassp2022_depression_tpu import config as C

AE, TE, AH, TH = 12, 20, 8, 8   # audio/text embed and hidden dims
N, BS, EPOCHS = 8, 2, 5


class TorchFusion(tnn.Module):
    """Reference fusion_net layout (fuse_net_whole.py:245-308 key names)."""

    def __init__(self):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(TH, TH),
                                              tnn.ReLU(inplace=True))
        self.lstm_net = tnn.LSTM(TE, TH, num_layers=2, bidirectional=True)
        self.fc_out = tnn.Sequential(tnn.Dropout(0.0), tnn.Linear(TH, TH),
                                     tnn.ReLU(), tnn.Dropout(0.0))
        self.lstm_net_audio = tnn.GRU(AE, AH, num_layers=2, batch_first=True)
        self.fc_audio = tnn.Sequential(tnn.Dropout(0.0), tnn.Linear(AH, AH),
                                       tnn.ReLU(), tnn.Dropout(0.0))
        self.ln = tnn.LayerNorm(AE)
        self.modal_attn = tnn.Linear(TH + AH, TH + AH, bias=False)
        self.fc_final = tnn.Sequential(tnn.Linear(TH + AH, 2, bias=False),
                                       tnn.Softmax(dim=1))

    def pretrained_feature(self, xa, xt):
        with torch.no_grad():
            out, (h_n, _) = self.lstm_net(xt.permute(1, 0, 2))
            out = out.permute(1, 0, 2)
            h_n = h_n.permute(1, 0, 2)
            half = out.shape[-1] // 2
            h = out[..., :half] + out[..., half:]
            q = h_n.sum(dim=1, keepdim=True)
            aw = torch.relu(self.attention_layer[0](q))
            sm = torch.softmax(torch.bmm(aw, torch.tanh(h).transpose(1, 2)),
                               dim=-1)
            ctx = torch.bmm(sm, h).squeeze(1)
            tf = self.fc_out(ctx)
            ha, _ = self.lstm_net_audio(self.ln(xa))
            af = self.fc_audio(ha.sum(dim=1))
        return tf, af


def test_fusion_trainer_tracks_torch():
    with jax.enable_x64(True):
        from icassp2022_depression_tpu.models import porting
        from icassp2022_depression_tpu.train import loop, optim, trainers

        fcfg = C.replace(C.FUSE_CLF, audio_embed_size=AE, text_embed_size=TE,
                         audio_hidden_dims=AH, text_hidden_dims=TH,
                         dropout=0.0)
        tcfg = C.replace(
            C.FUSE_CLF_TRAINER, batch_size=BS, epochs=EPOCHS + 1,
            model=C.replace(C.FUSE_CLF_TRAINER.model, dropout=0.0),
            optimizer=C.replace(C.FUSE_CLF_TRAINER.optimizer,
                                learning_rate=1e-3))

        torch.manual_seed(0)
        m = TorchFusion().double()
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params = porting.fusion_from_state_dict(sd, fcfg)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.array(a, copy=True), jnp.float64), params)

        rng = np.random.default_rng(0)
        y_np = (rng.random(N) < 0.5).astype(np.int64)
        xa_np = rng.standard_normal((N, 3, AE))
        xt_np = rng.standard_normal((N, 3, TE))

        # ---- torch reference-style fusion loop
        for p in m.parameters():
            p.requires_grad = False
        m.fc_final[0].weight.requires_grad = True
        opt = torch.optim.Adam([m.fc_final[0].weight], lr=1e-3)
        torch_losses = []
        for _ in range(EPOCHS):
            total = 0.0
            for i in range(0, N, BS):
                xa = torch.from_numpy(xa_np[i:i + BS])
                xt = torch.from_numpy(xt_np[i:i + BS])
                yb = torch.from_numpy(y_np[i:i + BS])
                opt.zero_grad()
                tf, af = m.pretrained_feature(xa, xt)
                w = m.fc_final[0].weight
                loss = (F.cross_entropy(F.linear(tf, w[:, :TH]), yb) +
                        F.cross_entropy(F.linear(af, w[:, TH:]), yb))
                loss.backward()
                opt.step()
                total += loss.item()
            torch_losses.append(total)

        # ---- our compiled fusion fold program
        train_loss, eval_fn = trainers._fusion_fns(fcfg, tcfg)
        optimizer = optim.build(tcfg.optimizer, params)
        run = loop.make_fold_runner(train_loss, eval_fn, optimizer,
                                    "classification", tcfg.gate,
                                    epochs=EPOCHS + 1, jit=False)
        data = loop.make_fold_data([xa_np, xt_np], y_np,
                                   [xa_np[:2], xt_np[:2]], y_np[:2], BS)
        data = loop.FoldData(
            train_x=tuple(a.astype(jnp.float64) for a in data.train_x),
            train_y=data.train_y, train_mask=data.train_mask,
            test_x=(jnp.zeros((2, TH + AH), jnp.float64),),  # precomputed form
            test_y=data.test_y, test_mask=data.test_mask)
        _, _, _, _, logs = jax.jit(run)(params, optimizer.init(params), data,
                                        jax.random.PRNGKey(0))

        np.testing.assert_allclose(np.asarray(logs["loss"]), torch_losses,
                                   rtol=1e-8, atol=1e-8)
