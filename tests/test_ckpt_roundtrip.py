"""Export -> import roundtrip of the reference checkpoint format."""

import os

import numpy as np
import pytest

import jax

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"
pytestmark = [pytest.mark.slow,  # golden/e2e tier (see pytest.ini)
              pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not present")]


def test_export_import_roundtrip(tmp_path):
    from mvsnerf_tpu.io.torch_ckpt import (export_reference_checkpoint,
                                           load_reference_checkpoint)
    ck = load_reference_checkpoint(CKPT)
    rng = np.random.default_rng(0)
    volume = rng.standard_normal((8, 10, 12, 8)).astype(np.float32)
    path = str(tmp_path / "export.tar")
    export_reference_checkpoint(path, ck["mlp"], ck["mvsnet"], volume,
                                global_step=123)
    back = load_reference_checkpoint(path)
    assert back["global_step"] == 123
    for a, b in zip(jax.tree.leaves(ck["mlp"]), jax.tree.leaves(back["mlp"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ck["mvsnet"]),
                    jax.tree.leaves(back["mvsnet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(back["volume"]), volume)


def test_exported_tar_loads_in_torch(tmp_path):
    """The exported container must load with plain torch and have the
    reference's exact key set."""
    import torch
    from mvsnerf_tpu.io.torch_ckpt import (export_reference_checkpoint,
                                           load_reference_checkpoint)
    ck = load_reference_checkpoint(CKPT)
    path = str(tmp_path / "export.tar")
    export_reference_checkpoint(path, ck["mlp"], ck["mvsnet"])
    ours = torch.load(path, map_location="cpu", weights_only=False)
    ref = torch.load(CKPT, map_location="cpu", weights_only=False)
    assert set(ours["network_fn_state_dict"]) == \
        set(ref["network_fn_state_dict"])
    assert set(ours["network_mvs_state_dict"]) == \
        set(ref["network_mvs_state_dict"])
    for k, v in ref["network_fn_state_dict"].items():
        np.testing.assert_array_equal(ours["network_fn_state_dict"][k],
                                      v.numpy())


def test_restore_exact_file_and_strict(tmp_path):
    """restore() loads EXACTLY a named .msgpack file (render_video.py must
    never silently fall back to the directory's latest snapshot) and raises
    in strict mode when nothing exists (ADVICE round-1 medium finding)."""
    import argparse
    import optax
    import pytest
    from mvsnerf_tpu.train.generalizable import GeneralizableSystem

    args = argparse.Namespace(ckpt="", net_type="v0", netdepth=6,
                              netwidth=128)
    system = GeneralizableSystem(args)
    system.opt_state = optax.adam(1e-3).init(system.params)

    d = str(tmp_path)
    system.global_step = 5
    path5 = system.save(d)
    system.params = jax.tree.map(lambda a: a + 1.0, system.params)
    system.global_step = 9
    system.save(d)

    # directory -> newest snapshot
    assert system.restore(d) == 9
    # exact file -> that file, not the newest
    assert system.restore(path5) == 5
    # strict + empty dir -> loud error
    with pytest.raises(FileNotFoundError):
        system.restore(str(tmp_path / "empty"), strict=True)
    assert system.restore(str(tmp_path / "empty")) == 0
