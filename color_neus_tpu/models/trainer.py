"""Training core: one jitted (state, batch, key) -> (state, metrics) step.

Functional counterpart of the reference NeuS_Trainer
(lib/models/NeuS_Trainer.py): camera nets + renderer + losses live in one
param pytree; ray sampling, rendering, loss, backward, per-leaf grad clip
and the Adam/warmup-cosine update all happen inside a single jit so XLA
fuses the whole step. Loss semantics match NeuS_Trainer.py:129-171; the
LR schedule matches NeuS_lr_scheduler (net_utils.py:56-78); per-parameter
grad clipping matches clip_gradient (net_utils.py:174-184).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from color_neus_tpu.models.configs import RendererConfig, renderer_config_from_cfg
from color_neus_tpu.models.camera import (
    CameraConfig, init_focal, init_pose, focal_apply, pose_apply,
)
from color_neus_tpu.models import neus
from color_neus_tpu.ops.rays import (
    near_far_from_sphere, rays_for_pixels, all_rays_for_camera,
    sample_pixels_uniform, sample_pixels_masked, sample_pixels_masked_exact,
)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainerConfig:
    n_rays: int = 1024
    eval_ray_size: int = 1024
    normalize_dir: bool = True
    opengl: bool = False
    include_mask: bool = True
    mask_rate: tuple = (0.5, 0.8)
    # masked pixel sampling: 'exact' (default — strict reference
    # parity: exactly int(rate * n_rays) in-mask rays, drawn without
    # replacement, ray_utils.py:61-76 semantics; jittable Gumbel-top-k)
    # or 'bernoulli' (each ray lands in-mask with prob mask_rate, with
    # replacement — same distribution in expectation, cheaper per step)
    mask_sample_mode: str = "exact"
    # replicate the maskless-path quirk (rays only from image 0) when asked
    first_image_only_quirk: bool = False

    lambda_fine: float = 1.0
    lambda_eikonal: float = 0.1
    lambda_mask: float = 0.1
    lambda_relight: float = 1.0
    rgb_loss_type: str = "mse"  # mse | l1

    iterations: int = 100000
    lr: float = 5e-4
    optimizer: str = "adam"          # adam | rmsprop | sgd (net_utils.py:81-106)
    scheduler: str = "NEUS"          # NEUS (warmup+cosine) | NERF (exp decay)
    warm_up: int = 5000
    lr_alpha: float = 0.05
    gamma: float = 0.1               # NERF scheduler decay factor
    decay_steps: int = 250000        # NERF scheduler decay interval
    grad_clip_enabled: bool = True
    grad_clip_norm: float = 1.0

    camera: CameraConfig = field(default_factory=CameraConfig)
    renderer: RendererConfig = field(default_factory=RendererConfig)

    # sharding mesh for multi-device runs (params replicated, rays sharded
    # on its 'dp' axis); None = single device. Threaded explicitly — no
    # module-global sharding state (see parallel/sharding.py).
    mesh: object = None


def trainer_config_from_cfg(cfg: dict, H: int, W: int, n_cams: int) -> TrainerConfig:
    """Build from a reference-schema config dict (cfg.MODEL + cfg.TRAIN)."""
    m = cfg["MODEL"]
    t = cfg["TRAIN"]
    dp = cfg.get("DATA_PRESET", {})
    loss = m.get("LOSS", {})
    opt = t.get("OPTIMIZE", {})
    include_mask = dp.get("INCLUDE_MASK", True)
    return TrainerConfig(
        n_rays=m.get("N_RAYS", 1024),
        eval_ray_size=m.get("EVAL_RAY_SIZE", 10000),
        normalize_dir=m.get("NORMALIZE_DIR", True),
        opengl=dp.get("OPENGL_SYS", False),
        include_mask=include_mask,
        mask_rate=tuple(m.get("MASK_RATE", (0.5, 0.8))) if include_mask else None,
        mask_sample_mode=dp.get("MASK_SAMPLE_MODE", "exact"),
        # replicate the reference's maskless-path quirk on request
        # (rays only from image 0, SURVEY §3.6 / ray_utils.py:57-59)
        first_image_only_quirk=dp.get("FIRST_IMAGE_ONLY_QUIRK", False),
        lambda_fine=loss.get("LAMBDA_FINE", 1.0),
        lambda_eikonal=loss.get("LAMBDA_EIKONAL", 0.1),
        lambda_mask=loss.get("LAMBDA_MASK", 0.0),
        lambda_relight=loss.get("LAMBDA_RELIGHT", 1.0),
        rgb_loss_type=loss.get("RGB_LOSS_TYPE", "mse"),
        iterations=t.get("ITERATIONS", 100000),
        lr=opt.get("LR", 5e-4),
        optimizer=opt.get("TYPE", "adam"),
        scheduler=opt.get("SCHEDULER_TYPE", "NEUS"),
        warm_up=opt.get("WARM_UP", 5000),
        lr_alpha=opt.get("LR_ALPHA", 0.05),
        gamma=opt.get("GAMMA", 0.1),
        decay_steps=opt.get("LRATE_DECAY", 250000),
        grad_clip_enabled=t.get("GRAD_CLIP_ENABLED", True),
        grad_clip_norm=float(t.get("GRAD_CLIP", {}).get("NORM", 1.0)),
        camera=CameraConfig(
            learn_focal=m.get("LEARN_FOCAL", False),
            learn_r=m.get("LEARN_R", False),
            learn_t=m.get("LEARN_T", False),
            fx_only=dp.get("FX_ONLY", False),
            focal_order=m.get("FOCAL_ORDER", 2),
            pose_mode=m.get("POSE_MODE", "6d"),
            H=H, W=W, n_cams=n_cams,
        ),
        renderer=renderer_config_from_cfg(m["RENDERER"]),
    )


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------

def neus_lr_schedule(cfg: TrainerConfig):
    """Linear warm-up then cosine decay to lr*alpha (net_utils.py:56-78)."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(cfg.warm_up, 1)
        progress = (step - cfg.warm_up) / jnp.maximum(cfg.iterations - cfg.warm_up, 1)
        cos = (jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)) + 1.0) * 0.5 * (1 - cfg.lr_alpha) + cfg.lr_alpha
        return cfg.lr * jnp.where(step < cfg.warm_up, warm, cos)
    return sched


def nerf_lr_schedule(cfg: TrainerConfig):
    """Exponential decay lr * gamma^(step/decay_steps) (net_utils.py:40-53)."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        return cfg.lr * cfg.gamma ** (step / cfg.decay_steps)
    return sched


def lr_schedule(cfg: TrainerConfig):
    if cfg.scheduler.upper() == "NERF":
        return nerf_lr_schedule(cfg)
    return neus_lr_schedule(cfg)


def clip_per_leaf(max_norm: float):
    """Per-parameter-tensor L2 norm clip, matching torch clip_grad_norm_
    applied leaf-by-leaf (net_utils.py:174-184)."""
    def clip_fn(updates, state=None, params=None):
        def one(g):
            n = jnp.linalg.norm(g.reshape(-1))
            return g * jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-6))
        return jax.tree_util.tree_map(one, updates), state
    return optax.GradientTransformation(lambda _: optax.EmptyState(), clip_fn)


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    parts = []
    if cfg.grad_clip_enabled:
        parts.append(clip_per_leaf(cfg.grad_clip_norm))
    # optimizer families of build_optimizer_nerf (net_utils.py:81-106)
    kind = cfg.optimizer.lower()
    if kind == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8))
    elif kind == "rmsprop":
        parts.append(optax.scale_by_rms(decay=0.99, eps=1e-8))
    elif kind == "sgd":
        pass  # plain gradient
    else:
        raise NotImplementedError(f"optimizer {cfg.optimizer}")
    parts += [
        optax.scale_by_schedule(lr_schedule(cfg)),
        optax.scale(-1.0),
    ]
    return optax.chain(*parts)


def init_state(key, cfg: TrainerConfig, init_focal_np=None, init_c2w=None, dtype=jnp.float32):
    """Returns (state, scene). state = trainable pytree + opt state + step;
    scene = non-trainable buffers (init poses, origin, radius are set by
    the caller via make_scene)."""
    k_r, _ = jax.random.split(key)
    params = {
        "renderer": neus.init_renderer(k_r, cfg.renderer, dtype),
        "focal": init_focal(cfg.camera, init_focal_np, dtype),
        "pose": init_pose(cfg.camera, dtype),
    }
    opt_state = make_optimizer(cfg).init(params)
    return {"params": params, "opt_state": opt_state, "step": jnp.asarray(0, jnp.int32)}


def make_scene(origin, radius, init_c2w, dtype=jnp.float32):
    return {
        "origin": jnp.asarray(origin, dtype).reshape(3),
        "radius": jnp.asarray(radius, dtype).reshape(()),
        "init_c2w": jnp.asarray(init_c2w, dtype),
    }


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def compute_loss(cfg: TrainerConfig, render: dict):
    """NeuS_Trainer.compute_loss (129-171) semantics."""
    rgb_gt = render["rgb_map_gt"]
    if cfg.rgb_loss_type == "mse":
        rgb_fine_loss = jnp.mean((render["color_fine"] - rgb_gt) ** 2)
    elif cfg.rgb_loss_type == "l1":
        rgb_fine_loss = jnp.mean(jnp.abs(render["color_fine"] - rgb_gt))
    else:
        raise ValueError(f"no such rgb loss type: {cfg.rgb_loss_type}")

    loss = cfg.lambda_fine * rgb_fine_loss
    eik = render["gradient_error"]
    loss = loss + cfg.lambda_eikonal * eik
    loss_dict = {"rgb_fine_loss": rgb_fine_loss, "eikonal_loss": eik}

    if cfg.lambda_mask != 0 and render.get("mask") is not None:
        ws = jnp.clip(render["weight_sum"].squeeze(-1), 1e-3, 1.0 - 1e-3)
        m = render["mask"]
        mask_loss = -jnp.mean(m * jnp.log(ws) + (1.0 - m) * jnp.log(1.0 - ws))
        loss = loss + cfg.lambda_mask * mask_loss
        loss_dict["mask_loss"] = mask_loss

    if cfg.lambda_relight != 0 and "delta_relight" in render:
        delta = render["delta_relight"]
        if render.get("mask") is not None:
            delta = delta * render["mask"][:, None, None]
        relight_loss = jnp.mean(delta) ** 2
        loss = loss + cfg.lambda_relight * relight_loss
        loss_dict["relight_loss"] = relight_loss
    elif cfg.lambda_relight != 0 and "delta_sum" in render:
        # per-ray sums from the fused ray-march path: mean over the full
        # [R, S, 3] delta tensor == sum(mask_r * dsum_r) / (R*S*3)
        dsum = render["delta_sum"]
        if render.get("mask") is not None:
            dsum = dsum * render["mask"]
        n_el = dsum.shape[0] * render["n_samples_total"] * 3
        relight_loss = (jnp.sum(dsum) / n_el) ** 2
        loss = loss + cfg.lambda_relight * relight_loss
        loss_dict["relight_loss"] = relight_loss

    loss_dict["loss"] = loss
    return loss, loss_dict


# ---------------------------------------------------------------------------
# Forward for a batch of sampled rays
# ---------------------------------------------------------------------------

def _mask_rate_at(cfg: TrainerConfig, step):
    m0, m1 = cfg.mask_rate
    return m0 + (m1 - m0) * step.astype(jnp.float32) / cfg.iterations


def render_random_rays(params, scene, cfg: TrainerConfig, images, masks, img_ids,
                       step, key):
    """Sample cfg.n_rays over the image batch and render them.

    images: [B, H, W, 3]; masks: [B, H, W] or None; img_ids: [B].
    Mirrors NeuS_Trainer.render (103-127) with on-device ray generation.
    """
    B, H, W = images.shape[:3]
    k_pix, k_perturb = jax.random.split(key)

    focal = focal_apply(params["focal"], cfg.camera)
    c2w = pose_apply(params["pose"], cfg.camera, scene["init_c2w"], img_ids)  # [B,4,4]

    if cfg.include_mask and masks is not None:
        rate = _mask_rate_at(cfg, step)
        sampler = (sample_pixels_masked_exact
                   if cfg.mask_sample_mode == "exact"
                   else sample_pixels_masked)
        cam_sel, py, px, sel_mask = sampler(k_pix, masks, cfg.n_rays, rate)
    else:
        cam_sel, py, px = sample_pixels_uniform(
            k_pix, B, H, W, cfg.n_rays, first_image_only=cfg.first_image_only_quirk)
        sel_mask = None

    rays_o, rays_d = rays_for_pixels(
        c2w[cam_sel], focal, px, py, H, W,
        normalize=cfg.normalize_dir, opengl=cfg.opengl)
    rgb_gt = images[cam_sel, py, px]

    # Multi-device: shard the ray axis here so all downstream per-ray
    # compute (the MLP sweeps) partitions across cfg.mesh.
    from color_neus_tpu.parallel.sharding import constrain_rays
    rays_o = constrain_rays(rays_o, cfg.mesh)
    rays_d = constrain_rays(rays_d, cfg.mesh)
    rgb_gt = constrain_rays(rgb_gt, cfg.mesh)
    sel_mask = constrain_rays(sel_mask, cfg.mesh)

    rays_o = (rays_o - scene["origin"]) / scene["radius"]
    near, far = near_far_from_sphere(rays_o, rays_d)
    render = neus.render_rays_train(params["renderer"], cfg.renderer,
                                    rays_o, rays_d, near, far, key=k_perturb,
                                    mesh=cfg.mesh)
    render["rgb_map_gt"] = rgb_gt
    render["mask"] = sel_mask
    return render


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def train_step(state, scene, cfg: TrainerConfig, images, masks, img_ids, key):
    """One optimization step. Jit with cfg static:
    jax.jit(train_step, static_argnums=2) or use make_train_step."""
    step = state["step"]

    def loss_fn(params):
        render = render_random_rays(params, scene, cfg, images, masks, img_ids, step, key)
        loss, loss_dict = compute_loss(cfg, render)
        aux = dict(loss_dict)
        aux["s_val"] = jnp.mean(render["s_val"])
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
    tx = make_optimizer(cfg)
    updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    new_state = {"params": new_params, "opt_state": new_opt, "step": step + 1}
    aux["psnr"] = -10.0 * jnp.log10(jnp.maximum(aux["rgb_fine_loss"], 1e-10))
    aux["lr"] = lr_schedule(cfg)(step)
    return new_state, aux


@lru_cache(maxsize=32)
def make_train_step(cfg: TrainerConfig, donate: bool = True):
    # memoized on (cfg, donate): a second TrainLoop / evaluation run in
    # the same process with an identical config reuses the jitted step
    # instead of recompiling (TrainerConfig is a frozen dataclass)
    fn = partial(train_step, cfg=cfg)
    wrapped = lambda state, scene, images, masks, img_ids, key: fn(
        state, scene, images=images, masks=masks, img_ids=img_ids, key=key)
    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())


def _full_data_step(cfg: TrainerConfig, n_imgs: int, b: int,
                    state, scene, images, masks, base_key):
    """One step over the full device-resident dataset: the image batch is
    drawn inside the graph (randperm-prefix semantics like dtu.py:164-168)
    and the PRNG key is folded from a constant base key + the in-state
    step counter — no per-step host ops, fully resumable."""
    key = jax.random.fold_in(base_key, state["step"])
    k_ids, k_step = jax.random.split(key)
    img_ids = jax.random.choice(k_ids, n_imgs, (b,), replace=False).astype(jnp.int32)
    images_b = jnp.take(images, img_ids, axis=0)
    masks_b = jnp.take(masks, img_ids, axis=0) if masks is not None else None
    return train_step(state, scene, cfg, images_b, masks_b, img_ids, k_step)


@lru_cache(maxsize=32)
def make_train_step_full(cfg: TrainerConfig, n_imgs: int, batch_size: int,
                         donate: bool = True):
    b = min(batch_size, n_imgs)

    def step(state, scene, images, masks, base_key):
        return _full_data_step(cfg, n_imgs, b, state, scene, images, masks, base_key)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


@lru_cache(maxsize=32)
def make_train_multi_step(cfg: TrainerConfig, n_imgs: int, batch_size: int,
                          k_steps: int, donate: bool = True):
    """K optimization steps per dispatch via lax.scan.

    One device dispatch per bundle amortizes host/tunnel launch latency
    (measured ~30 ms/dispatch on the tunneled chip) across k_steps.
    Returns (state, aux-of-last-step + 'loss_mean' over the bundle)."""
    b = min(batch_size, n_imgs)

    def multi(state, scene, images, masks, base_key):
        def body(st, _):
            st, aux = _full_data_step(cfg, n_imgs, b, st, scene, images, masks, base_key)
            return st, aux
        state, auxs = jax.lax.scan(body, state, None, length=k_steps)
        aux = jax.tree_util.tree_map(lambda x: x[-1], auxs)
        aux["loss_mean"] = jnp.mean(auxs["loss"])
        return state, aux

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Full-image rendering (validation / testing)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def make_render_image_fn(cfg: TrainerConfig):
    """All chunks of a full image inside ONE jit (lax.map over EVAL_RAY_SIZE
    chunks) — the reference's host-side chunk loop
    (NeuS_Trainer.py:233-245) would cost one dispatch round-trip per chunk
    (~30 ms each on a tunneled chip; ~2000 chunks for a DTU image)."""
    def render_fn(params, scene, rays_o_c, rays_d_c, keys):
        def chunk(args):
            ro, rd, k = args
            ro = (ro - scene["origin"]) / scene["radius"]
            near, far = near_far_from_sphere(ro, rd)
            out = neus.render_rays(params["renderer"], cfg.renderer, ro, rd,
                                   near, far, key=k)
            return out["color_fine"], out["depth"]
        return jax.lax.map(chunk, (rays_o_c, rays_d_c, keys))
    return jax.jit(render_fn)


def render_image(params, scene, cfg: TrainerConfig, cam_id: int, H: int, W: int,
                 key, chunk_fn=None):
    """Render a full image (NeuS_Trainer.validate_image capability).
    Returns (rgb [H,W,3], depth [H,W]) as numpy arrays."""
    if chunk_fn is None:
        chunk_fn = make_render_image_fn(cfg)
    focal = focal_apply(params["focal"], cfg.camera)
    c2w = pose_apply(params["pose"], cfg.camera, scene["init_c2w"],
                     jnp.asarray([cam_id]))[0]
    rays_o, rays_d = all_rays_for_camera(c2w, focal, H, W,
                                         normalize=cfg.normalize_dir, opengl=cfg.opengl)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)

    n = rays_o.shape[0]
    cs = cfg.eval_ray_size
    n_pad = (-n) % cs
    rays_o = jnp.concatenate([rays_o, jnp.zeros((n_pad, 3), rays_o.dtype)], axis=0)
    rays_d = jnp.concatenate([rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], axis=0)
    n_chunks = rays_o.shape[0] // cs
    keys = jax.random.split(key, n_chunks)

    rgb, depth = chunk_fn(params, scene,
                          rays_o.reshape(n_chunks, cs, 3),
                          rays_d.reshape(n_chunks, cs, 3), keys)
    rgb = np.asarray(rgb).reshape(-1, 3)[:n].reshape(H, W, 3)
    depth = np.asarray(depth).reshape(-1)[:n].reshape(H, W)
    return rgb, depth
