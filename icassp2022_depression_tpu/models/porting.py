"""Porting reference PyTorch checkpoints into this framework's params.

The reference pickles whole torch modules (``torch.save(model)``); a user
migrating from it holds ``.pt`` files whose ``state_dict()`` keys follow the
module layouts in ``Classification/audio_gru_whole.py:24-108``,
``text_bilstm_whole.py:23-114`` and ``fuse_net_whole.py:245-308``.  These
functions map such a state dict (as a ``{name: np.ndarray}`` mapping —
detach/convert on the torch side) tensor-for-tensor onto our param trees,
enabling bit-parity evaluation of reference-trained models on TPU.

Key-layout notes encoded here:

* the RNN tensors use torch's ``weight_ih_l{k}[_reverse]`` stacking, which
  is exactly our ``w_ih`` layout (gate order r,z,n / i,f,g,o);
* the FC-head Sequential indices differ per variant: heads with a leading
  Dropout expose Linears at ``.1``/``.4`` (audio both tracks, text reg),
  without it at ``.0``/``.3`` (text clf) — derived from
  ``RNNConfig.head_input_dropout``.
"""

from __future__ import annotations

import pickle
import types
from typing import Mapping

import numpy as np
import jax.numpy as jnp

from icassp2022_depression_tpu.config import FusionConfig, RNNConfig


def _np(sd: Mapping, key: str) -> jnp.ndarray:
    if key not in sd:
        raise KeyError(f"state dict missing {key!r}; have e.g. "
                       f"{sorted(sd)[:8]}")
    # Copy defensively: state-dict values are typically torch
    # ``.detach().numpy()`` VIEWS of live parameters, and jnp.asarray on CPU
    # can zero-copy alias them — later in-place torch updates would then
    # silently mutate the "ported" params.
    return jnp.asarray(np.array(sd[key], copy=True))


def rnn_from_state_dict(sd: Mapping, prefix: str, num_layers: int,
                        bidirectional: bool):
    """torch (Bi)RNN tensors ``{prefix}.weight_ih_l{k}[_reverse]`` etc.
    -> our layer-list params."""
    layers = []
    for layer in range(num_layers):
        entry = {"fwd": {
            "w_ih": _np(sd, f"{prefix}.weight_ih_l{layer}"),
            "w_hh": _np(sd, f"{prefix}.weight_hh_l{layer}"),
            "b_ih": _np(sd, f"{prefix}.bias_ih_l{layer}"),
            "b_hh": _np(sd, f"{prefix}.bias_hh_l{layer}"),
        }}
        if bidirectional:
            entry["bwd"] = {
                "w_ih": _np(sd, f"{prefix}.weight_ih_l{layer}_reverse"),
                "w_hh": _np(sd, f"{prefix}.weight_hh_l{layer}_reverse"),
                "b_ih": _np(sd, f"{prefix}.bias_ih_l{layer}_reverse"),
                "b_hh": _np(sd, f"{prefix}.bias_hh_l{layer}_reverse"),
            }
        layers.append(entry)
    return layers


def _linear(sd: Mapping, prefix: str):
    return {"w": _np(sd, f"{prefix}.weight"), "b": _np(sd, f"{prefix}.bias")}


def _head_indices(cfg: RNNConfig):
    return (1, 4) if cfg.head_input_dropout else (0, 3)


def audio_net_from_state_dict(sd: Mapping, cfg: RNNConfig):
    """AudioBiLSTM state dict -> :mod:`..models.audio_net` params.
    Keys: ``lstm_net_audio.*``, ``fc_audio.{1,4}.*``, ``attention_layer.0.*``,
    ``ln.*`` (clf only)."""
    i1, i2 = _head_indices(cfg)
    params = {
        "rnn": rnn_from_state_dict(sd, "lstm_net_audio", cfg.rnn_layers,
                                   cfg.bidirectional),
        "attn": _linear(sd, "attention_layer.0"),
        "fc1": _linear(sd, f"fc_audio.{i1}"),
        "fc2": _linear(sd, f"fc_audio.{i2}"),
    }
    if cfg.input_layernorm:
        params["ln"] = {"w": _np(sd, "ln.weight"), "b": _np(sd, "ln.bias")}
    return params


def text_net_from_state_dict(sd: Mapping, cfg: RNNConfig):
    """TextBiLSTM state dict -> :mod:`..models.text_net` params.
    Keys: ``lstm_net.*``, ``fc_out.{0,3}`` (clf) / ``fc_out.{1,4}`` (reg),
    ``attention_layer.0.*``, ``ln1/ln2`` when present."""
    i1, i2 = _head_indices(cfg)
    params = {
        "rnn": rnn_from_state_dict(sd, "lstm_net", cfg.rnn_layers,
                                   cfg.bidirectional),
        "attn": _linear(sd, "attention_layer.0"),
        "fc1": _linear(sd, f"fc_out.{i1}"),
        "fc2": _linear(sd, f"fc_out.{i2}"),
    }
    for ln in ("ln1", "ln2"):
        if f"{ln}.weight" in sd:
            params[ln] = {"w": _np(sd, f"{ln}.weight"),
                          "b": _np(sd, f"{ln}.bias")}
        else:
            dim = (cfg.embedding_size if ln == "ln1" else cfg.hidden_dims)
            params[ln] = {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    return params


def fusion_from_state_dict(sd: Mapping, cfg: FusionConfig):
    """fusion_net state dict -> :mod:`..models.fusion` params.
    Keys per ``fuse_net_whole.py:245-308`` (clf; reg lacks ``ln``)."""
    params = {
        "text": {
            "attn": _linear(sd, "attention_layer.0"),
            "rnn": rnn_from_state_dict(sd, "lstm_net", cfg.rnn_layers, True),
            "fc": _linear(sd, "fc_out.1"),
        },
        "audio": {
            "rnn": rnn_from_state_dict(sd, "lstm_net_audio", cfg.rnn_layers,
                                       False),
            "fc": _linear(sd, "fc_audio.1"),
        },
        "modal_attn": {"w": _np(sd, "modal_attn.weight")},
        "fc_final": {"w": _np(sd, "fc_final.0.weight")},
    }
    if cfg.audio_layernorm:
        params["audio"]["ln"] = {"w": _np(sd, "ln.weight"),
                                 "b": _np(sd, "ln.bias")}
    return params


# -- loading the reference's whole-module ``.pt`` pickles --------------------
#
# The reference's only checkpoint artifact is ``torch.save(model)`` of the
# ENTIRE module (``Classification/audio_gru_whole.py:125``,
# ``fuse_net_whole.py:33``, ``Regression/fuse_net.py:370`` ...), and its
# eval harnesses ``torch.load`` those files directly
# (``Classification/FuseModelChecking.py:100``,
# ``Regression/AudioModelChecking.py:157``).  Unpickling such a file
# normally requires importing the script that defined the class (and the
# exact torch version its nn.Modules were pickled under).  Instead,
# :func:`load_reference_pt` unpickles with a restricted ``find_class``:
# torch's tensor-rebuild helpers and container primitives resolve for real
# (so the raw weights materialise), while EVERY other global — the
# reference's model classes, torch's nn.Module classes, anything else the
# pickle names — resolves to an inert shim that only captures attribute
# state.  No reference code (or any other pickled callable) ever executes,
# and no torch-version-compatible class definitions are needed.  The state
# dict is then read off the shim graph by walking torch's persistent
# ``_parameters``/``_buffers``/``_modules`` attribute layout.


class _ShimBase:
    """Inert stand-in for a non-allowlisted pickled global.

    Covers every way pickle can touch a class object: NEWOBJ/REDUCE
    construction (``__init__`` swallows args), BUILD (``__setstate__``
    stores state), and stray calls on instances (return self).  Nothing
    here executes third-party logic."""

    def __init__(self, *args, **kwargs):
        self._shim_args = args
        self._shim_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif (isinstance(state, tuple) and len(state) == 2
              and isinstance(state[0], dict)):
            # object.__reduce_ex__ (dict, slots) pair
            self.__dict__.update(state[0] or {})
            self.__dict__.update(state[1] or {})
        else:
            self.__dict__["_shim_state"] = state

    def __call__(self, *args, **kwargs):
        return self


_SHIM_CACHE: dict = {}


def _shim_class(module: str, name: str):
    key = (module, name)
    if key not in _SHIM_CACHE:
        _SHIM_CACHE[key] = type(name, (_ShimBase,), {
            "__module__": f"<shim:{module}>",
            "_shim_origin": f"{module}.{name}",
        })
    return _SHIM_CACHE[key]


class _SafeRefUnpickler(pickle.Unpickler):
    """Unpickler whose globals allowlist is just enough to rebuild raw
    tensors; every other global shims.

    The allowlist is per-NAME, not per-module: pickle's REDUCE opcode
    calls whatever ``find_class`` returns with attacker-chosen arguments,
    so resolving a whole module's namespace (the obvious implementation)
    would hand the pickle every callable in it — ``numpy.load``,
    ``torch.serialization.load``, ... — and void the no-execution
    guarantee.  Only data reconstructors resolve for real:

    * ``torch._utils._rebuild_*`` — the pure tensor/Parameter
      reconstructor family every torch.save stream uses;
    * ``torch.serialization._get_layout``, ``torch.storage
      ._load_from_bytes`` — legacy (pre-zipfile) stream helpers;
    * ``collections.OrderedDict``, numpy's array reconstructors;
    * via the ``torch`` module itself: dtypes, ``*Storage`` classes,
      ``Size``/``device`` (type objects, not code)."""

    _ALLOWED = {
        "collections": ("OrderedDict",),
        "torch.serialization": ("_get_layout",),
        "torch.storage": ("_load_from_bytes",),
        "numpy": ("ndarray", "dtype"),
        "numpy.core.multiarray": ("_reconstruct", "scalar"),
        "numpy._core.multiarray": ("_reconstruct", "scalar"),
    }

    def find_class(self, module, name):  # noqa: D102 (pickle API)
        import importlib

        if (name in self._ALLOWED.get(module, ())
                or (module == "torch._utils" and name.startswith("_rebuild"))):
            return getattr(importlib.import_module(module), name)
        if module == "torch":
            import torch

            obj = getattr(torch, name, None)
            if (isinstance(obj, torch.dtype) or "Storage" in name
                    or name in ("Size", "device")):
                return obj
        return _shim_class(module, name)


#: ``pickle_module`` facade for ``torch.load`` — routes both the zipfile
#: and the legacy serialization paths through :class:`_SafeRefUnpickler`
#: (torch's own wrapper subclasses it, keeping storage persistent-id
#: handling on torch's side).
_safe_pickle_module = types.SimpleNamespace(
    __name__="icassp2022_depression_tpu.models.porting._safe_pickle_module",
    Unpickler=_SafeRefUnpickler,
    load=lambda f, **kw: _SafeRefUnpickler(f, **kw).load(),
)


def _tensor_np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy().copy()
    return np.array(t, copy=True)


def _walk_module_shim(obj, prefix: str, out: dict) -> None:
    """Read ``state_dict()``-style dotted names off a shim'd nn.Module
    graph via torch's ``_parameters``/``_buffers``/``_modules`` layout."""
    d = getattr(obj, "__dict__", None) or {}
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = _tensor_np(p)
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = _tensor_np(b)
    for name, m in (d.get("_modules") or {}).items():
        if m is not None:
            _walk_module_shim(m, f"{prefix}{name}.", out)


def load_reference_pt(path) -> dict:
    """Extract ``{name: np.ndarray}`` from a reference ``.pt`` checkpoint.

    Accepts both artifact shapes the reference ecosystem produces: the
    whole-module pickle (``torch.save(model)``,
    ``audio_gru_whole.py:125``) and a plain ``state_dict()`` mapping.
    Reference classes are never imported or executed (see module notes
    above); tensors come back as defensive numpy copies ready for the
    ``*_from_state_dict`` mappers."""
    import torch

    obj = torch.load(path, map_location="cpu",
                     pickle_module=_safe_pickle_module, weights_only=False)
    if isinstance(obj, Mapping):  # torch.save(model.state_dict())
        import torch as _t

        sd = {k: _tensor_np(v) for k, v in obj.items()
              if isinstance(v, (_t.Tensor, np.ndarray))}
        if sd:
            return sd
        raise ValueError(f"{path}: mapping checkpoint holds no tensors")
    d = getattr(obj, "__dict__", None) or {}
    if "_parameters" not in d and "_modules" not in d:
        raise ValueError(
            f"{path}: not a torch module pickle (top-level object "
            f"{getattr(type(obj), '_shim_origin', type(obj).__name__)} has "
            "no _parameters/_modules layout)")
    out: dict = {}
    _walk_module_shim(obj, "", out)
    if not out:
        raise ValueError(f"{path}: module pickle contained no tensors")
    return out


#: model-kind -> state-dict mapper, for extension-dispatched loading
_PT_MAPPERS = {
    "audio": audio_net_from_state_dict,
    "text": text_net_from_state_dict,
    "fusion": fusion_from_state_dict,
}


def params_from_reference_pt(path, kind: str, cfg):
    """``.pt`` file -> our param tree: :func:`load_reference_pt` then the
    ``kind`` mapper ('audio' | 'text' | 'fusion') under ``cfg``."""
    return _PT_MAPPERS[kind](load_reference_pt(path), cfg)


# -- exporting our params back to reference-layout state dicts ---------------
#
# The inverse direction: a model TRAINED HERE, validated in the reference's
# own torch harness.  These emit ``{name: np.ndarray}`` dicts whose keys are
# exactly the reference modules' ``state_dict()`` names (the layouts at
# ``Classification/audio_gru_whole.py:24-108``, ``text_bilstm_whole.py:23-114``,
# ``fuse_net_whole.py:245-308``), so ``ref_model.load_state_dict(...)`` under
# strict=True accepts them tensor-for-tensor.  Together with the
# ``*_from_state_dict`` importers above, migration is bidirectional.


def _np_out(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def rnn_to_state_dict(layers, prefix: str) -> dict:
    """Our layer-list RNN params -> torch ``{prefix}.weight_ih_l{k}`` names
    (inverse of :func:`rnn_from_state_dict`; same gate stacking)."""
    out = {}
    for k, entry in enumerate(layers):
        for dirn, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if dirn not in entry:
                continue
            p = entry[dirn]
            out[f"{prefix}.weight_ih_l{k}{suffix}"] = _np_out(p["w_ih"])
            out[f"{prefix}.weight_hh_l{k}{suffix}"] = _np_out(p["w_hh"])
            out[f"{prefix}.bias_ih_l{k}{suffix}"] = _np_out(p["b_ih"])
            out[f"{prefix}.bias_hh_l{k}{suffix}"] = _np_out(p["b_hh"])
    return out


def _emit_linear(out: dict, prefix: str, p, bias: bool = True) -> None:
    out[f"{prefix}.weight"] = _np_out(p["w"])
    if bias:
        out[f"{prefix}.bias"] = _np_out(p["b"])


def audio_net_to_state_dict(params, cfg: RNNConfig) -> dict:
    """Inverse of :func:`audio_net_from_state_dict`."""
    i1, i2 = _head_indices(cfg)
    out = rnn_to_state_dict(params["rnn"], "lstm_net_audio")
    _emit_linear(out, "attention_layer.0", params["attn"])
    _emit_linear(out, f"fc_audio.{i1}", params["fc1"])
    _emit_linear(out, f"fc_audio.{i2}", params["fc2"])
    if cfg.input_layernorm:
        out["ln.weight"] = _np_out(params["ln"]["w"])
        out["ln.bias"] = _np_out(params["ln"]["b"])
    return out


def text_net_to_state_dict(params, cfg: RNNConfig) -> dict:
    """Inverse of :func:`text_net_from_state_dict`.  ``ln1``/``ln2`` are
    always emitted: the reference module declares them (unused) so
    strict ``load_state_dict`` requires the keys."""
    i1, i2 = _head_indices(cfg)
    out = rnn_to_state_dict(params["rnn"], "lstm_net")
    _emit_linear(out, "attention_layer.0", params["attn"])
    _emit_linear(out, f"fc_out.{i1}", params["fc1"])
    _emit_linear(out, f"fc_out.{i2}", params["fc2"])
    for ln in ("ln1", "ln2"):
        out[f"{ln}.weight"] = _np_out(params[ln]["w"])
        out[f"{ln}.bias"] = _np_out(params[ln]["b"])
    return out


def fusion_to_state_dict(params, cfg: FusionConfig) -> dict:
    """Inverse of :func:`fusion_from_state_dict`."""
    out = rnn_to_state_dict(params["text"]["rnn"], "lstm_net")
    out.update(rnn_to_state_dict(params["audio"]["rnn"], "lstm_net_audio"))
    _emit_linear(out, "attention_layer.0", params["text"]["attn"])
    _emit_linear(out, "fc_out.1", params["text"]["fc"])
    _emit_linear(out, "fc_audio.1", params["audio"]["fc"])
    out["modal_attn.weight"] = _np_out(params["modal_attn"]["w"])
    out["fc_final.0.weight"] = _np_out(params["fc_final"]["w"])
    if cfg.audio_layernorm:
        out["ln.weight"] = _np_out(params["audio"]["ln"]["w"])
        out["ln.bias"] = _np_out(params["audio"]["ln"]["b"])
    return out


_PT_EXPORTERS = {
    "audio": audio_net_to_state_dict,
    "text": text_net_to_state_dict,
    "fusion": fusion_to_state_dict,
}


def export_reference_pt(params, kind: str, cfg, path) -> dict:
    """Save our param tree as a reference-layout ``state_dict()`` ``.pt``.

    The artifact loads on the torch side with the two-liner the torch
    ecosystem standardises on (``m = AudioBiLSTM(...);
    m.load_state_dict(torch.load(path))``) — deliberately a state-dict
    pickle, not the reference's whole-module pickle, because emitting the
    latter would require constructing (hence copying) the reference's
    class code.  Returns the exported ``{name: np.ndarray}`` mapping."""
    import torch

    sd = _PT_EXPORTERS[kind](params, cfg)
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
    return sd


def load_params(ckpt, kind: str, cfg, template):
    """Uniform checkpoint resolution for eval/serving call sites.

    In-memory pytrees pass through; ``*.pt`` dispatches to the reference
    loader (whole-module or state-dict pickles); anything else is one of
    our ``.npz`` checkpoints loaded against ``template``."""
    from icassp2022_depression_tpu.train import checkpoints

    if isinstance(ckpt, dict):
        return ckpt
    if str(ckpt).endswith(".pt"):
        return params_from_reference_pt(ckpt, kind, cfg)
    return checkpoints.load(ckpt, like=template)
