import numpy as np
import jax.numpy as jnp
from flax import nnx


def test_bev_lanedet_train_and_infer(rng):
    import optax
    from paddle3d_tpu.models.backbones import ResNet
    from paddle3d_tpu.models.detection import BEVLaneDet
    rngs = nnx.Rngs(0)
    model = BEVLaneDet(
        backbone=ResNet(depth=18, base_channels=8, out_indices=(2,),
                        rngs=rngs),
        bev_size=(16, 8), in_channels=32, feat_channels=16, embed_dims=2,
        rngs=rngs)
    b, hb, wb = 1, 16, 8
    img = rng.uniform(0, 255, (b, 64, 96, 3)).astype(np.float32)
    grid = rng.uniform(0, 1, (b, hb, wb, 2)).astype(np.float32)
    inst = np.zeros((b, hb, wb), np.int32)
    inst[0, :, 2] = 1
    inst[0, :, 5] = 2
    batch = {
        "data": jnp.asarray(img),
        "bev_grid": jnp.asarray(grid),
        "lane_conf": jnp.asarray((inst > 0).astype(np.float32)),
        "lane_offset": jnp.asarray(
            rng.uniform(0, 1, (b, hb, wb)).astype(np.float32)),
        "lane_height": jnp.asarray(np.zeros((b, hb, wb), np.float32)),
        "lane_instance": jnp.asarray(inst),
    }
    optimizer = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, optimizer, batch):
        loss, grads = nnx.value_and_grad(
            lambda m: m.train_forward(batch)["loss"])(model)
        optimizer.update(model, grads)
        return loss

    losses = [float(step(model, optimizer, batch)) for _ in range(6)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    out = model.test_forward(
        {"data": batch["data"], "bev_grid": batch["bev_grid"]})
    assert out["lane_conf"].shape == (b, hb, wb)
