"""Importer for reference torch checkpoints (ckpts/mvsnerf-v0.tar).

The reference saves `{global_step, network_fn_state_dict,
network_mvs_state_dict[, volume]}` (train_mvs_nerf_pl.py:277-288). This
module reads that torch zip/pickle container and converts it into this
framework's channel-last param pytrees:

    torch Linear weight (out, in)         -> kernel (in, out)
    torch Conv2d weight (out, in, kh, kw) -> kernel (kh, kw, in, out)
    torch Conv3d weight (O, I, kd, kh, kw)-> kernel (kd, kh, kw, I, O)
    torch ConvTranspose3d weight (I, O, k³) -> kernel flip(k³), (k³, I, O)
    InPlaceABN weight/bias/running_mean/var -> abn scale/bias/mean/var
    RefVolume feat_volume (1, 8, D, h, w)  -> volume (D, h, w, 8)

A torch-free zip+pickle reader is used when torch is unavailable
(production TPU images need not ship torch).
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile

import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------ raw tensor reader ---

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # needs ml_dtypes view
}


class _TorchUnpickler(pickle.Unpickler):
    """Minimal unpickler for torch zip checkpoints without torch installed."""

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            return dict
        if module == "torch.serialization":
            return lambda *a, **k: None
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from torch checkpoint")

    def persistent_load(self, pid):
        # pid = ('storage', StorageType, key, location, numel)
        assert pid[0] == "storage"
        storage_type, key, _loc, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = _DTYPES[storage_type.name]
        with self._zf.open(f"{self._prefix}/data/{key}") as f:
            raw = f.read()
        return np.frombuffer(raw, dtype=dtype, count=numel)


class _StorageType:
    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       *args, **kwargs):
    arr = storage[storage_offset: storage_offset + int(np.prod(size))
                  if size else storage_offset + 1]
    if not size:
        return arr.reshape(())
    # produce a contiguous array honoring stride
    out = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=size,
        strides=[s * storage.itemsize for s in stride],
    )
    return np.ascontiguousarray(out)


def read_torch_zip(path: str) -> dict:
    """Read a torch >=1.6 zip checkpoint into nested dicts of np arrays,
    with no torch dependency."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl")][0]
        prefix = pkl[: -len("/data.pkl")]
        with zf.open(pkl) as f:
            data = f.read()
        up = _TorchUnpickler(io.BytesIO(data), zf, prefix)
        return up.load()


def load_torch_state(path: str) -> dict:
    """Load the raw reference checkpoint dict (numpy tensors)."""
    try:
        return read_torch_zip(path)
    except Exception:
        # Legacy (non-zip) containers: fall back to torch if present.
        import torch  # noqa: local fallback only

        ck = torch.load(path, map_location="cpu", weights_only=False)

        def to_np(x):
            return x.numpy() if hasattr(x, "numpy") else x

        def walk(d):
            if isinstance(d, dict):
                return {k: walk(v) for k, v in d.items()}
            return to_np(d)

        return walk(ck)


# ------------------------------------------------------------- converters ---

def _lin(sd, name):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _abn(sd, name):
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"]),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
        "mean": jnp.asarray(sd[f"{name}.running_mean"]),
        "var": jnp.asarray(sd[f"{name}.running_var"]),
    }


def _conv2d(sd, name):
    w = sd[f"{name}.weight"]  # (O, I, kh, kw)
    return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}


def _conv3d(sd, name):
    w = sd[f"{name}.weight"]  # (O, I, kd, kh, kw)
    return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)))}


def _deconv3d(sd, name):
    w = sd[f"{name}.weight"]  # (I, O, kd, kh, kw)
    w = w[:, :, ::-1, ::-1, ::-1]  # flip spatial for dilated-conv equivalence
    return {"kernel": jnp.asarray(np.ascontiguousarray(
        np.transpose(w, (2, 3, 4, 0, 1))))}


def convert_mlp_state(sd: dict, net_type: str = "v0") -> dict:
    """network_fn_state_dict ('nerf.*' keys) -> MLP param pytree."""
    sd = {k[len("nerf."):]: v for k, v in sd.items() if k.startswith("nerf.")}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("pts_linears."))
    p = {
        "pts_linears": [_lin(sd, f"pts_linears.{i}") for i in range(n_layers)],
        "pts_bias": _lin(sd, "pts_bias"),
    }
    if "views_linears.0.weight" in sd:
        n_v = 1 + max(int(k.split(".")[1]) for k in sd
                      if k.startswith("views_linears."))
        p["views_linears"] = [_lin(sd, f"views_linears.{i}")
                              for i in range(n_v)]
    for head in ("feature_linear", "alpha_linear", "rgb_linear",
                 "weight_out", "output_linear"):
        if f"{head}.weight" in sd:
            p[head] = _lin(sd, head)
    if net_type == "fusion":
        # Sequential heads: feature_linear.0, alpha_linear.0, rgb_out.0
        for head, tname in (("feature_linear", "feature_linear.0"),
                            ("alpha_linear", "alpha_linear.0"),
                            ("rgb_out", "rgb_out.0")):
            if f"{tname}.weight" in sd:
                p[head] = _lin(sd, tname)
    for attn in ("color_attention", "ray_attention"):
        if f"{attn}.w_qs.weight" in sd:
            p[attn] = {
                "w_qs": _lin(sd, f"{attn}.w_qs"),
                "w_ks": _lin(sd, f"{attn}.w_ks"),
                "w_vs": _lin(sd, f"{attn}.w_vs"),
                "fc": _lin(sd, f"{attn}.fc"),
                "layer_norm": {
                    "scale": jnp.asarray(sd[f"{attn}.layer_norm.weight"]),
                    "bias": jnp.asarray(sd[f"{attn}.layer_norm.bias"]),
                },
            }
    return p


def convert_mvsnet_state(sd: dict) -> dict:
    """network_mvs_state_dict -> MVSNet param pytree (110 tensors)."""
    from ..models.mvsnet import _COSTREG_DEC, _COSTREG_ENC, _FEATURE_CFG

    feature = {}
    for group, cfg in _FEATURE_CFG.items():
        feature[group] = [
            {"conv": _conv2d(sd, f"feature.{group}.{i}.conv"),
             "bn": _abn(sd, f"feature.{group}.{i}.bn")}
            for i in range(len(cfg))
        ]
    top = _conv2d(sd, "feature.toplayer")
    top["bias"] = jnp.asarray(sd["feature.toplayer.bias"])
    feature["toplayer"] = top

    cost_reg = {}
    for name, *_ in _COSTREG_ENC:
        cost_reg[name] = {"conv": _conv3d(sd, f"cost_reg_2.{name}.conv"),
                          "bn": _abn(sd, f"cost_reg_2.{name}.bn")}
    for name, _cin, _cout in _COSTREG_DEC:
        cost_reg[name] = {
            "deconv": _deconv3d(sd, f"cost_reg_2.{name}.0"),
            "bn": {
                "scale": jnp.asarray(sd[f"cost_reg_2.{name}.1.weight"]),
                "bias": jnp.asarray(sd[f"cost_reg_2.{name}.1.bias"]),
                "mean": jnp.asarray(sd[f"cost_reg_2.{name}.1.running_mean"]),
                "var": jnp.asarray(sd[f"cost_reg_2.{name}.1.running_var"]),
            },
        }
    return {"feature": feature, "cost_reg_2": cost_reg}


def convert_volume_state(sd: dict):
    """Fine-tuned 'volume' state (RefVolume.feat_volume (1, C, D, h, w))
    -> (D, h, w, C) channel-last volume."""
    v = sd["feat_volume"]
    return jnp.asarray(np.transpose(v[0], (1, 2, 3, 0)))


def _lin_back(p):
    out = {"weight": np.asarray(p["kernel"]).T}
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


def export_reference_checkpoint(path: str, mlp_params, mvsnet_params=None,
                                volume=None, global_step: int = 0):
    """Write a reference-compatible torch checkpoint
    ({global_step, network_fn_state_dict, network_mvs_state_dict[, volume]},
    train_mvs_nerf_pl.py:277-288) so models trained here can be loaded by
    the reference tooling. Requires torch (dev environments only)."""
    import torch

    from ..models.mvsnet import _COSTREG_DEC, _COSTREG_ENC, _FEATURE_CFG

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))

    fn_sd = {}
    p = mlp_params
    for i, lin in enumerate(p["pts_linears"]):
        for k, v in _lin_back(lin).items():
            fn_sd[f"nerf.pts_linears.{i}.{k}"] = t(v)
    for name in ("pts_bias", "feature_linear", "alpha_linear", "rgb_linear",
                 "weight_out", "output_linear"):
        if name in p:
            for k, v in _lin_back(p[name]).items():
                fn_sd[f"nerf.{name}.{k}"] = t(v)
    for i, lin in enumerate(p.get("views_linears", [])):
        for k, v in _lin_back(lin).items():
            fn_sd[f"nerf.views_linears.{i}.{k}"] = t(v)

    ck = {"global_step": global_step, "network_fn_state_dict": fn_sd}

    if mvsnet_params is not None:
        mvs_sd = {}

        def put_abn(prefix, bn):
            mvs_sd[f"{prefix}.weight"] = t(bn["scale"])
            mvs_sd[f"{prefix}.bias"] = t(bn["bias"])
            mvs_sd[f"{prefix}.running_mean"] = t(bn["mean"])
            mvs_sd[f"{prefix}.running_var"] = t(bn["var"])
            mvs_sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

        feat = mvsnet_params["feature"]
        for group, cfg in _FEATURE_CFG.items():
            for i in range(len(cfg)):
                w = np.transpose(np.asarray(feat[group][i]["conv"]["kernel"]),
                                 (3, 2, 0, 1))
                mvs_sd[f"feature.{group}.{i}.conv.weight"] = t(w)
                put_abn(f"feature.{group}.{i}.bn", feat[group][i]["bn"])
        top = feat["toplayer"]
        mvs_sd["feature.toplayer.weight"] = t(
            np.transpose(np.asarray(top["kernel"]), (3, 2, 0, 1)))
        mvs_sd["feature.toplayer.bias"] = t(top["bias"])

        cr = mvsnet_params["cost_reg_2"]
        for name, *_ in _COSTREG_ENC:
            w = np.transpose(np.asarray(cr[name]["conv"]["kernel"]),
                             (4, 3, 0, 1, 2))
            mvs_sd[f"cost_reg_2.{name}.conv.weight"] = t(w)
            put_abn(f"cost_reg_2.{name}.bn", cr[name]["bn"])
        for name, _ci, _co in _COSTREG_DEC:
            # undo the import-time spatial flip + IO transpose
            w = np.transpose(np.asarray(cr[name]["deconv"]["kernel"]),
                             (3, 4, 0, 1, 2))[:, :, ::-1, ::-1, ::-1]
            mvs_sd[f"cost_reg_2.{name}.0.weight"] = t(w.copy())
            bn = cr[name]["bn"]
            mvs_sd[f"cost_reg_2.{name}.1.weight"] = t(bn["scale"])
            mvs_sd[f"cost_reg_2.{name}.1.bias"] = t(bn["bias"])
            mvs_sd[f"cost_reg_2.{name}.1.running_mean"] = t(bn["mean"])
            mvs_sd[f"cost_reg_2.{name}.1.running_var"] = t(bn["var"])
            mvs_sd[f"cost_reg_2.{name}.1.num_batches_tracked"] = \
                torch.tensor(0)
        ck["network_mvs_state_dict"] = mvs_sd

    if volume is not None:
        v = np.transpose(np.asarray(volume), (3, 0, 1, 2))[None]
        ck["volume"] = {"feat_volume": t(v)}

    import torch as _torch
    _torch.save(ck, path)
    return path


def load_reference_checkpoint(path: str, net_type: str = "v0") -> dict:
    """Full import: returns {'global_step', 'mlp', 'mvsnet'[, 'volume']}."""
    ck = load_torch_state(path)
    out = {"global_step": int(np.asarray(ck.get("global_step", 0)))}
    if "network_fn_state_dict" in ck:
        out["mlp"] = convert_mlp_state(ck["network_fn_state_dict"], net_type)
    if "network_mvs_state_dict" in ck:
        out["mvsnet"] = convert_mvsnet_state(ck["network_mvs_state_dict"])
    if "volume" in ck and ck["volume"]:
        out["volume"] = convert_volume_state(ck["volume"])
    return out
