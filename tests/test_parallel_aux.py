"""Multihost helpers (single-process semantics) + I3D remat wiring +
image dataset."""

import jax
import jax.numpy as jnp
import numpy as np

from dmcnet_tpu.parallel.multihost import (
    effective_lr_step_divisor,
    global_batch_from_local,
    initialize_distributed,
    local_shard_indices,
    process_seed,
)
from dmcnet_tpu.parallel import make_mesh


def test_single_process_no_init():
    assert initialize_distributed() is False
    assert process_seed(5) == 5
    assert list(local_shard_indices(16)) == list(range(16))
    assert effective_lr_step_divisor(4) == 4 * jax.device_count()


def test_global_batch_from_local():
    mesh = make_mesh()
    local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = global_batch_from_local(local, mesh)
    assert out["x"].shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])


def test_i3d_remat_same_params():
    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables

    x = jnp.zeros((1, 16, 224, 224, 2))
    v_plain = jax.eval_shape(lambda: init_i3d_variables(
        I3D(num_classes=5, modality="flow"), jax.random.key(0), x))
    v_remat = jax.eval_shape(lambda: init_i3d_variables(
        I3D(num_classes=5, modality="flow", remat=True),
        jax.random.key(0), x))
    assert jax.tree.structure(v_plain) == jax.tree.structure(v_remat)


def test_i3d_remat_covers_generator_exactly():
    """remat=True also rematerializes the embedded estimator (its
    per-frame full-resolution activations dominate HBM traffic); the
    rewrite must be exact: same param tree, same forward, same grads."""
    from dmcnet_tpu.models.i3d import I3D, init_i3d_variables

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 32, 32, 5)), jnp.float32)
    nets, variables = [], []
    for remat in (False, True):
        net = I3D(num_classes=5, modality="flow+mp4",
                  arch_estimator="DenseNetTiny", remat=remat)
        nets.append(net)
        variables.append(init_i3d_variables(net, jax.random.key(0), x))
    assert (jax.tree.structure(variables[0])
            == jax.tree.structure(variables[1]))

    def loss(params, net, bstats):
        logits, gen = net.apply(
            {"params": params, "batch_stats": bstats}, x,
            "flow+logit", False, False)
        return jnp.sum(logits ** 2) + jnp.sum(gen ** 2)

    grads = [jax.grad(loss)(v["params"], n, v["batch_stats"])
             for n, v in zip(nets, variables)]
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_image_list_dataset(tmp_path):
    from PIL import Image

    from dmcnet_tpu.data.image_iterator import ImageListDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(
            np.full((8, 8, 3), i * 10, np.uint8)).save(
            img_dir / f"im{i}.png")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(f"{i} {i % 2} im{i}.png" for i in range(3)))
    ds = ImageListDataset(str(img_dir), str(lst))
    assert len(ds) == 3
    arr, label = ds[1]
    assert arr.shape == (8, 8, 3) and label == 1
    assert (arr == 10).all()


def test_initialize_distributed_rejects_partial_flags():
    """--dist-coordinator without --dist-num-processes must raise, not
    silently run N unsynchronized trainings."""
    import pytest

    from dmcnet_tpu.parallel.multihost import initialize_distributed

    with pytest.raises(ValueError, match="dist-num-processes"):
        initialize_distributed(coordinator_address="127.0.0.1:5555")
