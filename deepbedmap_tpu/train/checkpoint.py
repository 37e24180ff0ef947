"""Checkpointing: Orbax save/restore + Chainer-npz import shim.

Reference behaviour (srgan_train.py:1333-1383, SURVEY.md section 5.4): G+D
weights to .npz when the test RMSE improves; resume re-downloads the npz and
rebuilds the arch. Improvements here: the full train state — both models,
both Adam states, BatchNorm statistics, step — checkpoints atomically via
Orbax, so resume is exact (the reference loses optimizer state).

The npz shim imports weights saved by the reference's Chainer models
(``chainer.serializers.save_npz``) into this framework's parameter trees,
including the layout changes:
- conv kernels (C_out, C_in, kh, kw) -> (kh, kw, C_in, C_out);
- the input block's k30s10/k6s2 kernels -> space-to-depth 3x3 form;
- 12 repeated RRDB blocks -> the scan's stacked leading axis;
- linear W (out, in) -> (in, out).

Offset-channel order: Chainer's deformable-conv sampler documents its offset
input as horizontal (x) offsets in the FIRST kh*kw channels and vertical (y)
in the second half; ours is [y-halves, x-halves] row-major over taps
(ops.deform_conv docstring). ``offset_order='xy'`` (the default) therefore
swaps the halves on import; tests/test_chainer_semantics.py locks this
against a from-scratch NumPy sampler implementing the documented Chainer
semantics (and shows 'yx' would not match). If a real released-weights
forward ever disagrees, flip to 'yx' — the flag exists for exactly that.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


_async_ckptr = None  # singleton AsyncCheckpointer, created on first use


def save_checkpoint(state, path: str, block: bool = True) -> None:
    """Atomic Orbax checkpoint of the full GANState.

    ``block=False``: initiate the save and return once the device->host
    copy is done — disk serialization proceeds on Orbax's background thread
    while the caller runs the next training epoch (the ~320 MB reference
    GANState costs ~1-3 s of wall-clock to write, vs a 4.2 s epoch). A
    subsequent save waits for the in-flight one; call
    ``wait_for_checkpoints()`` before reading the path or exiting. Orbax's
    tmp-dir + rename commit keeps kill-safety: an interrupted background
    write leaves no half-checkpoint at ``path``."""
    import orbax.checkpoint as ocp

    if block:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), state, force=True)
        return
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    _async_ckptr.save(
        os.path.abspath(path), args=ocp.args.StandardSave(state), force=True
    )


def wait_for_checkpoints() -> None:
    """Block until every ``save_checkpoint(block=False)`` has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_checkpoint(path: str, template):
    """Restore a GANState saved by ``save_checkpoint`` (template provides the
    tree structure/shapes, e.g. a freshly created state)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def checkpoint_has_ema(path: str) -> bool:
    """Whether a saved GANState checkpoint carries an EMA tree — read from the
    Orbax metadata (no array restore), so callers can build the matching
    template instead of try/except-ing a doomed restore."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.metadata(os.path.abspath(path)).item_metadata.tree
    return tree.get("g_ema") is not None


# --------------------------------------------------------------------------
# Chainer npz import
# --------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """(C_out, C_in, kh, kw) -> (kh, kw, C_in, C_out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _strided_conv_w(w: np.ndarray, block: int) -> np.ndarray:
    """(C_out, C_in, 3b, 3b) -> space-to-depth 3x3 form (3, 3, b*b*C_in, C_out).

    Channel order matches ops.resize.space_to_depth: (bh, bw, c) row-major.
    """
    c_out, c_in = w.shape[:2]
    return np.ascontiguousarray(
        w.reshape(c_out, c_in, 3, block, 3, block)
        .transpose(2, 4, 3, 5, 1, 0)
        .reshape(3, 3, block * block * c_in, c_out)
    )


def _offset_conv_w(w: np.ndarray, offset_order: str) -> np.ndarray:
    """Offset-conv kernel with optional y/x half swap of output channels."""
    out = _conv_w(w)  # (3, 3, C_in, 2K)
    if offset_order == "xy":  # source stores x-halves first; ours is y-first
        k = out.shape[-1] // 2
        out = np.concatenate([out[..., k:], out[..., :k]], axis=-1)
    return out


def _offset_bias(b: np.ndarray, offset_order: str) -> np.ndarray:
    if offset_order == "xy":
        k = len(b) // 2
        return np.concatenate([b[k:], b[:k]])
    return b


def import_chainer_generator_npz(
    npz: Any,  # path or dict-like of name -> array
    num_residual_blocks: int = 12,
    offset_order: str = "xy",
) -> Dict:
    """Build the flax Generator params tree from a Chainer GeneratorModel npz."""
    if isinstance(npz, (str, os.PathLike)):
        npz = dict(np.load(npz))
    g = {k: np.asarray(v) for k, v in npz.items()}

    def conv(prefix):
        return {
            "kernel": _conv_w(g[f"{prefix}/W"]),
            "bias": g[f"{prefix}/b"],
        }

    def strided(prefix, block):
        return {
            "Conv_0": {
                "kernel": (
                    _strided_conv_w(g[f"{prefix}/W"], block)
                    if block > 1
                    else _conv_w(g[f"{prefix}/W"])
                ),
                "bias": g[f"{prefix}/b"],
            }
        }

    def deform(prefix):
        return {
            "offset_conv": {
                "kernel": _offset_conv_w(g[f"{prefix}/offset_conv/W"], offset_order),
                "bias": _offset_bias(g[f"{prefix}/offset_conv/b"], offset_order),
            },
            "kernel": _conv_w(g[f"{prefix}/deform_conv/W"]),
            "bias": g[f"{prefix}/deform_conv/b"],
        }

    def rdb(prefix):
        return {
            f"conv_layer{i}": conv(f"{prefix}/conv_layer{i}") for i in range(1, 6)
        }

    # stack the repeated RRDBs along the scan axis
    stacked: Dict = {}
    for b in range(num_residual_blocks):
        tree = {
            f"residual_dense_block{j}": rdb(
                f"residual_network/{b}/residual_dense_block{j}"
            )
            for j in (1, 2, 3)
        }
        stacked = _stack_into(stacked, {"block": tree})

    return {
        "input_block": {
            "conv_on_X": strided("input_block/conv_on_X", 1),
            "conv_on_W1": strided("input_block/conv_on_W1", 10),
            "conv_on_W2": strided("input_block/conv_on_W2", 2),
            "conv_on_W3": strided("input_block/conv_on_W3", 1),
        },
        "pre_residual_conv_layer": conv("pre_residual_conv_layer"),
        "residual_network": stacked,
        "post_residual_conv_layer": conv("post_residual_conv_layer"),
        "post_upsample_conv_layer_1": conv("post_upsample_conv_layer_1"),
        "post_upsample_conv_layer_2": conv("post_upsample_conv_layer_2"),
        "final_conv_layer1": deform("final_conv_layer1"),
        "final_conv_layer2": deform("final_conv_layer2"),
    }


def _stack_into(acc: Dict, tree: Dict) -> Dict:
    """Accumulate per-block trees into leading-axis-stacked arrays."""
    import jax

    if not acc:
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[None], tree)
    return jax.tree_util.tree_map(
        lambda stack, a: np.concatenate([stack, np.asarray(a)[None]], axis=0),
        acc,
        tree,
    )


def export_generator_npz(params: Dict, path: str, offset_order: str = "xy") -> None:
    """Inverse of the import shim: write reference-layout npz from our params
    (useful for cross-checking and for consumers of the reference format)."""
    flat: Dict[str, np.ndarray] = {}

    def inv_conv(tree, prefix):
        flat[f"{prefix}/W"] = np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
        flat[f"{prefix}/b"] = np.asarray(tree["bias"])

    def inv_strided(tree, prefix, block):
        kern = np.asarray(tree["Conv_0"]["kernel"])
        if block > 1:
            kh, kw, bc, co = kern.shape
            c_in = bc // (block * block)
            kern = (
                kern.reshape(3, 3, block, block, c_in, co)
                .transpose(5, 4, 0, 2, 1, 3)
                .reshape(co, c_in, 3 * block, 3 * block)
            )
        else:
            kern = kern.transpose(3, 2, 0, 1)
        flat[f"{prefix}/W"] = np.ascontiguousarray(kern)
        flat[f"{prefix}/b"] = np.asarray(tree["Conv_0"]["bias"])

    def inv_deform(tree, prefix):
        ok = np.asarray(tree["offset_conv"]["kernel"])
        ob = np.asarray(tree["offset_conv"]["bias"])
        if offset_order == "xy":
            k = ok.shape[-1] // 2
            ok = np.concatenate([ok[..., k:], ok[..., :k]], axis=-1)
            ob = np.concatenate([ob[k:], ob[:k]])
        flat[f"{prefix}/offset_conv/W"] = ok.transpose(3, 2, 0, 1)
        flat[f"{prefix}/offset_conv/b"] = ob
        flat[f"{prefix}/deform_conv/W"] = np.asarray(tree["kernel"]).transpose(
            3, 2, 0, 1
        )
        flat[f"{prefix}/deform_conv/b"] = np.asarray(tree["bias"])

    inv_strided(params["input_block"]["conv_on_X"], "input_block/conv_on_X", 1)
    inv_strided(params["input_block"]["conv_on_W1"], "input_block/conv_on_W1", 10)
    inv_strided(params["input_block"]["conv_on_W2"], "input_block/conv_on_W2", 2)
    inv_strided(params["input_block"]["conv_on_W3"], "input_block/conv_on_W3", 1)
    inv_conv(params["pre_residual_conv_layer"], "pre_residual_conv_layer")
    inv_conv(params["post_residual_conv_layer"], "post_residual_conv_layer")
    inv_conv(params["post_upsample_conv_layer_1"], "post_upsample_conv_layer_1")
    inv_conv(params["post_upsample_conv_layer_2"], "post_upsample_conv_layer_2")
    inv_deform(params["final_conv_layer1"], "final_conv_layer1")
    inv_deform(params["final_conv_layer2"], "final_conv_layer2")

    blocks = params["residual_network"]["block"]
    n_blocks = np.asarray(
        blocks["residual_dense_block1"]["conv_layer1"]["kernel"]
    ).shape[0]
    for b in range(n_blocks):
        for j in (1, 2, 3):
            for i in range(1, 6):
                tree = blocks[f"residual_dense_block{j}"][f"conv_layer{i}"]
                prefix = f"residual_network/{b}/residual_dense_block{j}/conv_layer{i}"
                flat[f"{prefix}/W"] = np.asarray(tree["kernel"][b]).transpose(
                    3, 2, 0, 1
                )
                flat[f"{prefix}/b"] = np.asarray(tree["bias"][b])

    np.savez(path, **flat)
