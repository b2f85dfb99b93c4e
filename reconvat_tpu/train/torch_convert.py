"""Convert reference PyTorch state_dicts to flax variable trees.

Our flax modules use the same submodule attribute names as the reference
torch modules (e.g. `Unet1_encoder.block1.conv1`), so conversion is purely
structural: name-for-name with per-layer-type layout transforms.

  Conv2d weight        (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  ConvTranspose2d      (I, O, kh, kw)  -> kernel (kh, kw, O, I)
  Linear weight        (O, I)          -> kernel (I, O)
  BatchNorm            weight/bias     -> params scale/bias
                       running_mean/var-> batch_stats mean/var
  LSTM  weight_ih_l0 etc. -> see lstm_* helpers in nn.layers

Covers the released-weights -> F1-parity path (reference weights at
`Weight/*/weight.pt`, loaded by `transcribe_files.py:71`).
"""
from __future__ import annotations

import numpy as np


def _get_node(tree, path):
    node = tree
    for p in path:
        if node is None or p not in node:
            return None
        node = node[p]
    return node


def _to_numpy(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def torch_to_flax(state_dict, variables, strict: bool = False):
    """Returns ({'params': ..., 'batch_stats': ...}, report dict).

    `variables` provides the destination structure (from `module.init`).
    Unmatched torch entries are reported, mirroring the reference's
    name-intersection partial load (`model/self_attention_VAT.py:1316-1325`).
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    bstats = jax.tree_util.tree_map(
        np.asarray, dict(variables.get("batch_stats", {})))

    used, skipped = [], []

    for name, w in state_dict.items():
        w = _to_numpy(w)
        path = name.split(".")
        leaf = path[-1]
        mod_path = path[:-1]
        if leaf == "num_batches_tracked":
            continue

        pnode = _get_node(params, mod_path)
        bnode = _get_node(bstats, mod_path)

        placed = False
        if leaf == "weight" and pnode is not None:
            if "kernel" in pnode:
                dst = pnode["kernel"]
                if w.ndim == 4:
                    cand = w.transpose(2, 3, 1, 0)
                elif w.ndim == 2:
                    cand = w.T
                else:
                    cand = w
                if cand.shape == dst.shape:
                    pnode["kernel"] = cand.astype(dst.dtype)
                    placed = True
            elif "scale" in pnode and w.shape == pnode["scale"].shape:
                pnode["scale"] = w.astype(pnode["scale"].dtype)  # BatchNorm
                placed = True
        elif leaf == "bias" and pnode is not None and "bias" in pnode:
            if w.shape == pnode["bias"].shape:
                pnode["bias"] = w.astype(pnode["bias"].dtype)
                placed = True
        elif leaf == "running_mean" and bnode is not None and "mean" in bnode:
            bnode["mean"] = w.astype(bnode["mean"].dtype)
            placed = True
        elif leaf == "running_var" and bnode is not None and "var" in bnode:
            bnode["var"] = w.astype(bnode["var"].dtype)
            placed = True
        elif pnode is not None and leaf in pnode:
            dst = pnode[leaf]
            if w.shape == np.shape(dst):
                pnode[leaf] = w.astype(np.asarray(dst).dtype)
                placed = True

        (used if placed else skipped).append(name)

    if strict and skipped:
        raise ValueError(f"unconverted torch entries: {skipped}")
    out = {"params": params}
    if bstats:
        out["batch_stats"] = bstats
    return out, {"used": used, "skipped": skipped}


def load_torch_checkpoint(path: str):
    """Load a torch-saved state_dict from disk (requires torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _to_numpy(v) for k, v in obj.items()}
