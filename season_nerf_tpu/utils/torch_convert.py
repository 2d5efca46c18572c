"""Reference-checkpoint conversion: torch T_NeRF state_dict -> flax variables.

Lets a reference ``Final_Model.nn`` / ``Model_<step>.nn`` (a PyTorch
state_dict of T_NeRF_Full_2/T_NeRF_net_v2.py) load into this framework's
TNeRF for parity testing and for serving reference-trained models.  Includes
the reference's unused heads (adjust_rho / adjust_solar_vis /
adjust_sky_col, T_NeRF_net_v2.py:49-51) so conversion is one-to-one.

Layout notes: torch Linear weights are [out, in] -> flax kernels are their
transpose; BatchNorm1d weight/bias -> scale/bias params and
running_mean/var -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


# (torch prefix, flax path under params, has SineLayer .linear wrapper)
_SINE = [
    ("G_NeRF_net.fc1", ("gnerf", "fc1")),
    ("G_NeRF_net.fc2", ("gnerf", "fc2")),
    ("G_NeRF_net.fc3", ("gnerf", "fc3")),
    ("G_NeRF_net.fc4", ("gnerf", "fc4")),
    ("G_NeRF_net.fc5", ("gnerf", "fc5")),
    ("G_NeRF_net.fc6", ("gnerf", "fc6")),
    ("G_NeRF_net.fc7", ("gnerf", "fc7")),
    ("G_NeRF_net.fc8", ("gnerf", "fc8")),
    ("G_NeRF_net.fc9", ("gnerf", "fc9")),
    ("G_NeRF_net.fc_solar_1", ("gnerf", "fc_solar_1")),
    ("G_NeRF_net.fc_solar_2", ("gnerf", "fc_solar_2")),
    ("G_NeRF_net.fc_solar_3", ("gnerf", "fc_solar_3")),
    ("G_NeRF_net.fc_sky_color_1", ("gnerf", "fc_sky_1")),
    ("time_layer_1", ("time_1",)),
    ("time_layer_2", ("time_2",)),
    ("adjust_layer_1", ("adjust_1",)),
    ("adjust_layer_2", ("adjust_2",)),
    ("adjust_layer_3", ("adjust_3",)),
]

_LINEAR = [
    ("G_NeRF_net.fc10Col", ("gnerf", "fc10_col")),
    ("G_NeRF_net.fc10Sigma", ("gnerf", "fc10_sigma")),
    ("G_NeRF_net.fc_solar_4", ("gnerf", "fc_solar_4")),
    ("G_NeRF_net.fc_sky_color_2", ("gnerf", "fc_sky_2")),
    ("get_class_layer", ("class_head",)),
    ("adjust_col", ("adjust_col",)),
    ("adjust_rho", ("adjust_rho",)),
    ("adjust_solar_vis", ("adjust_solar_vis",)),
    ("adjust_sky_col", ("adjust_sky_col",)),
]


def _to_np(v):
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def _set(tree, path, leaf_name, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def convert_state_dict(state_dict: Dict) -> Tuple[Dict, Dict]:
    """torch state_dict -> (params, batch_stats) nested dicts."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def linear(prefix, path):
        if prefix + ".weight" not in sd:
            # tolerate reference-unused heads absent from flax-trained
            # state dicts (see _UNUSED_HEADS below)
            assert path[-1] in _UNUSED_HEADS, f"missing torch key {prefix}"
            return
        _set(params, path, "kernel", sd[prefix + ".weight"].T.copy())
        if prefix + ".bias" in sd:
            _set(params, path, "bias", sd[prefix + ".bias"].copy())

    for prefix, path in _SINE:
        linear(prefix + ".linear", path + ("linear",))
        if prefix + ".norm.weight" in sd:       # BatchNorm1d, not Identity
            _set(params, path + ("norm",), "scale",
                 sd[prefix + ".norm.weight"].copy())
            _set(params, path + ("norm",), "bias",
                 sd[prefix + ".norm.bias"].copy())
            _set(stats, path + ("norm",), "mean",
                 sd[prefix + ".norm.running_mean"].copy())
            _set(stats, path + ("norm",), "var",
                 sd[prefix + ".norm.running_var"].copy())
    for prefix, path in _LINEAR:
        linear(prefix, path)
    return params, stats


def _get(tree, path, leaf_name):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node[leaf_name])


def _has(tree, path, leaf_name):
    node = tree
    for p in path:
        if p not in node:
            return False
        node = node[p]
    return leaf_name in node


# Heads the reference defines but its forward never calls
# (T_NeRF_net_v2.py:49-51).  Flax materializes parameters lazily, so a model
# trained HERE has no leaves for them; a model converted FROM a reference
# checkpoint does.  When absent they may be left at the torch net's own
# init — no forward mode reads them.
_UNUSED_HEADS = ("adjust_rho", "adjust_solar_vis", "adjust_sky_col")


def to_state_dict(params: Dict, batch_stats: Dict) -> Dict:
    """The inverse of ``convert_state_dict``: flax (params, batch_stats) ->
    a torch ``T_NeRF`` state_dict (numpy values; wrap with
    ``torch.from_numpy`` via ``load_into_reference``).

    Round-trips exactly: ``convert_state_dict(to_state_dict(p, s)) == (p, s)``
    leaf-for-leaf.  Lets the reference's own eval harness
    (T_NeRF_Eval_Utils/Eval_funcs.py) score a model THIS framework trained —
    the cross-validation direction torch->flax alone cannot provide."""
    sd: Dict = {}

    def linear(prefix, path):
        if not _has(params, path, "kernel"):
            assert path[-1] in _UNUSED_HEADS, f"missing flax leaf at {path}"
            return
        sd[prefix + ".weight"] = _get(params, path, "kernel").T.copy()
        sd[prefix + ".bias"] = _get(params, path, "bias").copy()

    for prefix, path in _SINE:
        linear(prefix + ".linear", path + ("linear",))
        node = params
        for p in path:
            node = node.get(p, {})
        if "norm" in node:                      # BatchNorm1d, not Identity
            sd[prefix + ".norm.weight"] = _get(params, path + ("norm",),
                                               "scale").copy()
            sd[prefix + ".norm.bias"] = _get(params, path + ("norm",),
                                             "bias").copy()
            sd[prefix + ".norm.running_mean"] = _get(
                batch_stats, path + ("norm",), "mean").copy()
            sd[prefix + ".norm.running_var"] = _get(
                batch_stats, path + ("norm",), "var").copy()
            sd[prefix + ".norm.num_batches_tracked"] = np.asarray(
                0, dtype=np.int64)
    for prefix, path in _LINEAR:
        linear(prefix, path)
    return sd


def load_into_reference(ref_net, params: Dict, batch_stats: Dict):
    """Load flax variables into an instantiated reference ``T_NeRF``.
    Strict up to the reference's unused heads: every other torch parameter
    must be produced, and no unexpected key may appear."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).astype(
        np.float32) if v.dtype != np.int64 else np.ascontiguousarray(v))
        for k, v in to_state_dict(params, batch_stats).items()}
    result = ref_net.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    bad = [k for k in result.missing_keys
           if not any(u in k for u in _UNUSED_HEADS)]
    assert not bad, f"missing non-unused torch keys: {bad}"
    return ref_net


def load_reference_checkpoint(path_or_state_dict, template_variables):
    """Torch checkpoint file/state_dict -> flax variables matching
    ``template_variables`` (shape-validated leaf by leaf)."""
    if isinstance(path_or_state_dict, (str, bytes)):
        import torch
        obj = torch.load(path_or_state_dict, map_location="cpu",
                         weights_only=False)
        state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
    else:
        state_dict = path_or_state_dict
    params, stats = convert_state_dict(state_dict)

    import jax

    def check(got, want_tree):
        flat_w, _ = jax.tree_util.tree_flatten_with_path(want_tree)
        flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
        # align by path string
        gmap = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_flatten_with_path(got)[0]}
        for k, w in flat_w:
            ks = jax.tree_util.keystr(k)
            assert ks in gmap, f"missing converted leaf {ks}"
            assert gmap[ks].shape == w.shape, \
                f"shape mismatch at {ks}: {gmap[ks].shape} vs {w.shape}"

    check(params, template_variables["params"])
    variables = {"params": params}
    if "batch_stats" in template_variables:
        check(stats, template_variables["batch_stats"])
        variables["batch_stats"] = stats
    return jax.tree_util.tree_map(np.asarray, variables)
