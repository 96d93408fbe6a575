"""Multi-device data-parallel execution tests on a virtual CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest


def _example(b=64, l=96, seed=0):
    rng = np.random.default_rng(seed)
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(b, l)).astype(np.uint8)
    qual = rng.integers(33, 74, size=(b, l)).astype(np.uint8)
    lens = rng.integers(31, l + 1, size=(b,)).astype(np.int32)
    mask = np.arange(l)[None, :] < lens[:, None]
    return (np.where(mask, seq, 0).astype(np.uint8),
            np.where(mask, qual, 0).astype(np.uint8), lens)


def _params():
    from fqtool_tpu.config.options import Options
    opt = Options()
    opt.qual_filter.enabled = True
    opt.polyg_trim.enabled = True
    opt.polyx_trim.enabled = True
    opt.update()
    return opt.kernel_params()


def test_se_sharded_matches_single_device():
    import jax

    from fqtool_tpu.dist.sharding import make_mesh, run_se_sharded
    from fqtool_tpu.pipeline.se import se_pipeline

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    p = _params()
    seq, qual, lens = _example()
    z = np.zeros_like(lens)
    ones = np.ones(len(lens), bool)

    single = jax.device_get(se_pipeline(
        seq, qual, lens, z, ones, ones, p,
        adapter_r1=b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"))

    mesh = make_mesh(8)
    with mesh:
        sharded = jax.device_get(run_se_sharded(
            mesh, seq, qual, lens, z, ones, p,
            adapter_r1=b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"))

    for key in ("result", "passed", "front", "rlen", "dropped"):
        np.testing.assert_array_equal(np.asarray(single[key]),
                                      np.asarray(sharded[key]), err_msg=key)
    for f in single["pre"]._fields:
        np.testing.assert_array_equal(np.asarray(getattr(single["pre"], f)),
                                      np.asarray(getattr(sharded["pre"], f)),
                                      err_msg=f"pre.{f}")
    for f in single["post"]._fields:
        np.testing.assert_array_equal(np.asarray(getattr(single["post"], f)),
                                      np.asarray(getattr(sharded["post"], f)),
                                      err_msg=f"post.{f}")


def test_graft_entry_and_dryrun():
    import importlib.util
    import sys
    from pathlib import Path

    import jax

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    mod.dryrun_multichip(8)
