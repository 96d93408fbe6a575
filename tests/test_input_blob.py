"""Input-blob transport (pipeline/blob.py::call_blob): the fused one-message
path (FQTOOL_TPU_INBLOB=1) must produce outputs identical to the default
per-array path, including the implicit zero-padding of partial chunks."""

from __future__ import annotations

import numpy as np
import pytest

from fqtool_tpu.pipeline.blob import (BlobCall, _build_input_spec,
                                      pack_input_blob)


def _mk_args(rng, n, rows, width):
    seq = rng.integers(65, 85, (n, width)).astype(np.uint8)
    qual = rng.integers(33, 74, (n, width)).astype(np.uint8)
    lens = rng.integers(1, width + 1, n).astype(np.int32)
    keep = rng.random(n) < 0.8
    real = np.ones(n, bool)
    return (seq, qual, lens, keep, real)


def _body(seq, qual, lens, keep, real, scale=1):
    import jax.numpy as jnp

    return {
        "s": (seq.astype(jnp.int32) * scale).sum(axis=1),
        "q": qual,
        "mask": keep & real,
        "lens": lens * 2,
    }


@pytest.mark.parametrize("n", [64, 41])  # full and padded partial chunk
def test_call_blob_matches_per_array(n, monkeypatch):
    rows, width = 64, 37
    rng = np.random.default_rng(n)
    args = _mk_args(rng, n, rows, width)
    call = BlobCall(_body, ("scale",))

    monkeypatch.setenv("FQTOOL_TPU_INBLOB", "0")
    ref = call.call_blob(args, rows, scale=3).get()
    monkeypatch.setenv("FQTOOL_TPU_INBLOB", "1")
    got = call.call_blob(args, rows, scale=3).get()
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)


def test_call_blob_aux_args_not_padded(monkeypatch):
    """aux args (pack-level side data, e.g. transport dictionaries) must keep
    their own shape in both transports."""
    import jax.numpy as jnp

    rows, width = 32, 11
    rng = np.random.default_rng(3)
    seq, qual, lens, keep, real = _mk_args(rng, 20, rows, width)
    lut = rng.integers(0, 255, 32).astype(np.uint8)

    def body(seq, qual, lens, keep, real, lut):
        return {"x": seq.astype(jnp.int32) + lut.astype(jnp.int32)[0],
                "lut_sum": jnp.sum(lut.astype(jnp.int32))}

    call = BlobCall(body, ())
    monkeypatch.setenv("FQTOOL_TPU_INBLOB", "0")
    ref = call.call_blob((seq, qual, lens, keep, real), rows, aux=(lut,)).get()
    monkeypatch.setenv("FQTOOL_TPU_INBLOB", "1")
    got = call.call_blob((seq, qual, lens, keep, real), rows, aux=(lut,)).get()
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)
    assert int(np.asarray(got["lut_sum"])) == int(lut.astype(np.int64).sum())


def test_pack_roundtrip_spec():
    rows, width = 16, 9
    rng = np.random.default_rng(0)
    args = _mk_args(rng, 11, rows, width)
    spec, sections = _build_input_spec(rows, args)
    blob = pack_input_blob(args, spec, sections)
    # recover on host with the same slicing the device does
    i32_len, u8_words = sections
    u8 = blob[i32_len:].view(np.uint8)
    for a, (group, off, shape, dtype) in zip(args, spec):
        size = int(np.prod(shape))
        if group == "u8":
            got = u8[off : off + size].reshape(shape)
            if dtype == "bool":
                got = got != 0
        else:
            got = blob[off : off + size].reshape(shape)
        want = np.zeros(shape, got.dtype)
        want[: a.shape[0]] = a
        np.testing.assert_array_equal(got, want)
