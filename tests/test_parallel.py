"""Data-parallel correctness: the 8-device mesh step computes the same
update as the unsharded step (GSPMD collectives preserve semantics)."""

import numpy as np
import jax
import pytest

from season_nerf_tpu.config import Config
from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
from season_nerf_tpu.parallel.mesh import make_mesh, batch_sharding, \
    replicated_sharding
from season_nerf_tpu.train.engine import Trainer
from season_nerf_tpu.train import phases as pl


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_views=4, img_size=20, grid=24, seed=9)
    tt, vt = scene_ray_tables(scene, testing_size=1)
    return scene, tt, vt


def _train(scene, tt, vt, mesh, steps=3):
    # mesh_shape=1 opts out of Trainer's auto-mesh so the mesh=None leg
    # really runs single-device
    cfg = Config(max_train_steps=16, n_samples=8, batch_size=64,
                 fc_units=32, n_saves=0, logs_dir="", jump_start=True,
                 mesh_shape=None if mesh is not None else 1)
    tr = Trainer(cfg, tt, vt, prior_hm=scene.prior_hm, mesh=mesh)
    tr._enter_phase(pl.phase_at(tr.phases, 0))
    for _ in range(steps):
        tr.rng, k = jax.random.split(tr.rng)
        tr.state, scalars = tr._step_fn(tr.state, k)
    return tr.state, jax.device_get(scalars)


def test_mesh_matches_single_device(setup):
    scene, tt, vt = setup
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    mesh = make_mesh(8)
    state_m, scal_m = _train(scene, tt, vt, mesh)
    state_1, scal_1 = _train(scene, tt, vt, None)
    # identical rng stream -> identical batches -> same math up to
    # collective reduction ordering
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_m.params)):
        # Adam amplifies tiny reduction-order diffs on near-zero grads;
        # atol covers that, rtol guards real divergence
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    for k in scal_1:
        np.testing.assert_allclose(float(scal_1[k]), float(scal_m[k]),
                                   rtol=2e-3, atol=1e-5)


def test_mesh_render_matches_single_device():
    """Serving-side data parallelism: a Renderer given the 8-device mesh
    produces the same image as the single-device path (rays are independent;
    sharding must be semantics-free)."""
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.render.renderer import Renderer

    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    kw = dict(n_samples=8, chunk=300)   # not divisible by 8: rounding path
    r1 = Renderer(model, variables, **kw)
    r8 = Renderer(model, variables, mesh=make_mesh(8), **kw)
    assert r8.chunk % 8 == 0
    out1 = r1.render_img((70.0, 40.0), (45.0, 180.0), 0.5, 24)
    out8 = r8.render_img((70.0, 40.0), (45.0, 180.0), 0.5, 24)
    for k in ("Col_Img", "Shadow_Mask", "Height"):
        np.testing.assert_allclose(out1[k], out8[k], rtol=1e-5, atol=1e-5)


def test_shard_batch_layout():
    mesh = make_mesh(8)
    import jax.numpy as jnp
    x = jnp.zeros((64, 22))
    sh = batch_sharding(mesh)
    y = jax.device_put(x, sh)
    assert y.sharding.is_equivalent_to(sh, ndim=2)
    # each device holds 1/8 of the rows
    assert y.addressable_shards[0].data.shape == (8, 22)
    r = jax.device_put(x, replicated_sharding(mesh))
    assert r.addressable_shards[0].data.shape == (64, 22)


def test_make_mesh_refuses_oversubscription():
    """make_mesh(n) with fewer than n visible devices raises instead of
    silently building a smaller mesh (the bench/tool-facing sibling of the
    _auto_mesh guarantee below)."""
    with pytest.raises(ValueError, match="refusing"):
        make_mesh(len(jax.devices()) + 1)
    assert make_mesh(8).devices.size == 8


def test_auto_mesh_degradation_is_loud():
    """_auto_mesh never degrades to single-device silently: explicit
    mesh_shape that can't be honored raises; the auto path warns
    (VERDICT r2 #6 / ADVICE r2)."""
    import warnings
    from season_nerf_tpu.train.engine import _auto_mesh

    # explicit mesh_shape with an indivisible batch -> raise
    with pytest.raises(ValueError, match="not divisible"):
        _auto_mesh(Config(mesh_shape=8, batch_size=65))
    # explicit mesh_shape exceeding visible devices -> raise
    with pytest.raises(ValueError, match="device"):
        _auto_mesh(Config(mesh_shape=999, batch_size=999 * 4))
    # ...but the render-a-saved-model path clamps with a warning instead
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = _auto_mesh(Config(mesh_shape=999, batch_size=999 * 8),
                          strict=False)
    assert any("clamping" in str(x.message) for x in w)
    assert mesh is not None and mesh.devices.size == 8
    # auto path (mesh_shape=None) with an indivisible batch -> warn + None
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = _auto_mesh(Config(batch_size=65))
    assert mesh is None
    assert any("SINGLE-DEVICE" in str(x.message) for x in w)
    # happy path still builds the full mesh quietly
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = _auto_mesh(Config(batch_size=64))
    assert mesh is not None and mesh.devices.size == 8
    assert not w
