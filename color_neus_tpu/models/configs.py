"""Static (hashable) model configs.

These are the jit-static descriptions of the networks and renderer. They
mirror the reference's YAML schema (config/Color_NeuS_dtu.yml:23-61) so a
reference config maps 1:1; see color_neus_tpu/utils/config.py for the
YAML loader.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SDFConfig:
    """SDF MLP (reference fields.py:12-116)."""
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: tuple = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 3.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False


@dataclass(frozen=True)
class ColorConfig:
    """IDR rendering MLP (reference fields.py:119-188)."""
    d_feature: int = 256
    mode: str = "idr"  # idr | no_view_dir | no_normal
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 4
    squeeze_out: bool = True


@dataclass(frozen=True)
class RelightConfig:
    """View-dependent residual MLP (reference fields.py:289-368)."""
    d_in: int = 6
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    y_in_layer: int = 3
    multires_view: int = 4
    include_grad: bool = True
    inv_sigmoid: bool = True


@dataclass(frozen=True)
class VarianceConfig:
    """Single learnable s (reference fields.py:277-286)."""
    init_val: float = 0.3


@dataclass(frozen=True)
class NeRFConfig:
    """NeRF++ background MLP (reference fields.py:192-274)."""
    depth: int = 8
    width: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    skips: tuple = (4,)


@dataclass(frozen=True)
class RendererConfig:
    """Renderer hyperparameters (reference NeuS.py:71-93)."""
    kind: str = "color_neus"  # "neus" | "color_neus"
    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 0
    up_sample_steps: int = 4
    perturb: float = 1.0
    mc_block: int = 64  # grid-eval block size for mesh extraction
    # fused Pallas SDF sweeps: auto | on | off | interpret (see ops/pallas)
    fused_sdf: str = "auto"
    # fused per-point pipeline (sdf+grad+color+relight in one kernel with
    # custom VJP): auto | on | off | interpret
    fused_core: str = "auto"
    # fused ray-march training core (MLP + compositing + loss partials in
    # one kernel; loss path only): auto | on | off | interpret
    fused_march: str = "auto"
    # point-tile size for the fused pipeline kernels
    fused_tile: int = 512
    # fused-march backward activation policy: auto | recompute | save
    # (save = forward kernel exports the stash to HBM, backward loads it
    # instead of recomputing — bitwise-identical gradients, ~+16% step
    # throughput; auto saves only when the stash fits the HBM budget)
    march_acts: str = "auto"
    # march kernel point-tile size (0 = default 1024); lower it if the
    # save-mode stash blocks exceed VMEM at large S
    march_tile: int = 0
    # HBM budget (GB) the march_acts='auto' policy allows the saved-
    # activation stash before falling back to the recompute backward
    march_stash_budget_gb: float = 13.5
    # precision of the SDF chain inside the fused kernels (the bf16
    # rounding budget of the second-order eikonal path — the worst
    # grad-audit leaf lives here, reports/grad_audit.json):
    #   f32stash - PRODUCTION DEFAULT (round 4): f32 activation stores
    #              (Xs/Us/Zs + exported SX stash, exact softplus
    #              gates); dots stay bf16. Measured FREE on the bench
    #              chip (+0.5%, stash DMA fully overlapped:
    #              reports/r4/ab_prec_f32stash.json) and closes the 5k
    #              fused-vs-XLA quality gap from 2.74 dB to 0.27 dB
    #              (reports/r4/qg5k_fused_f32stash.json)
    #   bf16     - bf16 stores + bf16 MXU dots: halves stash HBM
    #              traffic/size; use when march_stash_budget_gb would
    #              force recompute mode at very large ray batches
    #   f32      - additionally f32 SDF weights and f32 dots through the
    #              whole SDF value/gradient/second-order chain
    # color/relight chains stay bf16 in all modes (grad err < 0.4%).
    march_bwd_precision: str = "f32stash"
    # strategy for the fused kernels' thin f32 dots (PE encode/pullback
    # K<=8 contractions + the f32 layer-0 dW dots) — the round-5
    # throughput recovery (reports/r5/ab_thin_*.json, paired A/B):
    #   hilo  - PRODUCTION DEFAULT: PE dots as 2 single-pass bf16 dots
    #           (data operand hi/lo-split; every pe_basis entry is
    #           3*2^k / 1*2^k / 0 = bf16-EXACT, so only the data needs
    #           splitting — phase error ~2^-17 vs bf16's 2^-8), and the
    #           f32 layer-0 dW dots as 2-pass hi/lo splits.
    #           +7.7% over 'mxu' (x1.0215 split, x1.0542 encode).
    #   mxu   - round-4 Precision.HIGHEST 6-pass MXU dots everywhere
    #           (exact f32; the quality-parity A/B reference arm)
    #   split - layer-0 dW hi/lo split only, PE dots HIGHEST (+2.15%)
    #   enc   - PE dots as exact-f32 VPU FMAs/lane reductions, dW
    #           HIGHEST (measured SLOWER on v5e: sublane broadcasts)
    #   vpu   - enc + split combined (-3.4% vs mxu; kept for A/B)
    # Interpret/oracle runs and march_bwd_precision='f32' always use
    # exact-f32 'highest' encode regardless (point_pipeline._enc_mode).
    thin_dots: str = "hilo"
    # mesh-extraction grid-eval dot precision (ops/mesh.py /
    # ops/pallas/sdf_mlp.make_fused_sdf_fn):
    #   f32   - 6-pass HIGHEST, matches the f32 XLA oracle to fma
    #           reassociation (the eval_fused gate arm; default)
    #   f32x3 - 3-pass HIGH: drops only the lo*lo product (~2^-16
    #           relative — a 512^3 voxel is 5e-3), ~2x the dot rate
    #   bf16  - single-pass preview (~1e-2 SDF error)
    extract_precision: str = "f32"
    # sparse (coarse-to-fine) mesh extraction: evaluate fine voxels only
    # in blocks the coarse pass puts near the surface (Lipschitz bound
    # from the eikonal property; ops/mesh.evaluate_sdf_grid_sparse).
    # ~25x less grid-eval work at 512^3; vertices bitwise identical to
    # the dense sweep. Off by default: the dense sweep remains the
    # bit-exactness gate arm (tools/tpu_eval_fused_check.py)
    extract_sparse: bool = False
    # dtype of the no-grad SDF sweep dots that PLACE importance samples
    # (hierarchical_z_vals): bfloat16 (fast, default) or float32
    sweep_dtype: str = "bfloat16"
    # activation of the no-grad placement sweeps: 'softplus' (exact
    # reference semantics) or 'relu' (softplus100 and relu differ by
    # <= ln2/100 per unit; samples shift O(1e-3) but the render core
    # still evaluates exact softplus at the chosen z — the sweeps'
    # VPU softplus chain is their measured bottleneck)
    sweep_activation: str = "softplus"
    # render-core ray chunking with rematerialization: activation memory is
    # O(ray_chunk * n_total_samples * width) instead of O(n_rays * ...);
    # 0 disables. Essential for large ray batches / deep sample counts.
    ray_chunk: int = 0
    # MLP matmul compute dtype: "float32" (parity) or "bfloat16" (fast —
    # params stay f32, accumulation stays f32)
    compute_dtype: str = "float32"
    sdf: SDFConfig = field(default_factory=SDFConfig)
    color: ColorConfig = field(default_factory=ColorConfig)
    relight: RelightConfig = field(default_factory=RelightConfig)
    variance: VarianceConfig = field(default_factory=VarianceConfig)
    nerf: NeRFConfig = field(default_factory=NeRFConfig)

    def __post_init__(self):
        # typo-proof the enum-valued knobs (ADVICE r4: a march_bwd_precision
        # typo like 'f32_stash' silently selected f32stash-like behavior)
        _enums = {
            "march_bwd_precision": ("bf16", "f32stash", "f32"),
            "thin_dots": ("hilo", "mxu", "vpu", "split", "enc"),
            "extract_precision": ("f32", "f32x3", "bf16"),
            "sweep_dtype": ("bfloat16", "float32"),
            "sweep_activation": ("softplus", "relu"),
            "march_acts": ("auto", "save", "recompute"),
            "kind": ("neus", "color_neus"),
        }
        for name, allowed in _enums.items():
            v = getattr(self, name)
            if v not in allowed:
                raise ValueError(
                    f"RendererConfig.{name}={v!r} not in {allowed}")


def _lower_get(d: dict, key: str, default):
    """Fetch an UPPERCASE yaml key with a default."""
    v = d.get(key, default)
    if isinstance(v, list):
        v = tuple(v)
    return v


def renderer_config_from_cfg(rcfg: dict) -> RendererConfig:
    """Build a RendererConfig from a reference-schema dict (cfg.MODEL.RENDERER)."""
    sdf = rcfg.get("SDF", {})
    color = rcfg.get("COLOR", {})
    relight = rcfg.get("RELIGHT", {})
    dev = rcfg.get("DEVIATION", {})
    nerf = rcfg.get("NERF", {})
    kind = {"NeuS": "neus", "Color_NeuS": "color_neus"}.get(rcfg.get("TYPE", "NeuS"), rcfg.get("TYPE", "neus"))
    if kind == "color_neus" and color.get("MODE", "idr") != "no_view_dir":
        raise ValueError("Color_NeuS requires COLOR.MODE == 'no_view_dir' (reference Color_NeuS.py:14)")
    return RendererConfig(
        kind=kind,
        n_samples=_lower_get(rcfg, "N_SAMPLES", 64),
        n_importance=_lower_get(rcfg, "N_IMPORTANCE", 64),
        n_outside=_lower_get(rcfg, "N_OUTSIDE", 0),
        up_sample_steps=_lower_get(rcfg, "UP_SAMPLE_STEPS", 4),
        perturb=_lower_get(rcfg, "PERTURB", 1.0),
        mc_block=_lower_get(rcfg, "N", 64),
        ray_chunk=_lower_get(rcfg, "RAY_CHUNK", 0),
        fused_sdf=_lower_get(rcfg, "FUSED_SDF", "auto"),
        fused_core=_lower_get(rcfg, "FUSED_CORE", "auto"),
        fused_march=_lower_get(rcfg, "FUSED_MARCH", "auto"),
        fused_tile=_lower_get(rcfg, "FUSED_TILE", 512),
        march_acts=_lower_get(rcfg, "MARCH_ACTS", "auto"),
        march_tile=_lower_get(rcfg, "MARCH_TILE", 0),
        march_stash_budget_gb=_lower_get(rcfg, "MARCH_STASH_BUDGET_GB", 13.5),
        march_bwd_precision=_lower_get(rcfg, "MARCH_BWD_PRECISION",
                                       "f32stash"),
        thin_dots=_lower_get(rcfg, "THIN_DOTS", "hilo"),
        extract_precision=_lower_get(rcfg, "EXTRACT_PRECISION", "f32"),
        extract_sparse=bool(_lower_get(rcfg, "EXTRACT_SPARSE", False)),
        sweep_dtype=_lower_get(rcfg, "SWEEP_DTYPE", "bfloat16"),
        sweep_activation=_lower_get(rcfg, "SWEEP_ACTIVATION", "softplus"),
        compute_dtype=_lower_get(rcfg, "COMPUTE_DTYPE", "float32"),
        sdf=SDFConfig(
            d_in=_lower_get(sdf, "D_IN", 3),
            d_out=_lower_get(sdf, "D_OUT", 257),
            d_hidden=_lower_get(sdf, "D_HIDDEN", 256),
            n_layers=_lower_get(sdf, "N_LAYERS", 8),
            skip_in=_lower_get(sdf, "SKIP_IN", (4,)),
            multires=_lower_get(sdf, "MULTIRES", 6),
            bias=_lower_get(sdf, "BIAS", 0.5),
            scale=_lower_get(sdf, "SCALE", 3.0),
            geometric_init=_lower_get(sdf, "GEOMETRIC_INIT", True),
            weight_norm=_lower_get(sdf, "WEIGHT_NORM", True),
            inside_outside=_lower_get(sdf, "INSIDE_OUTSIDE", False),
        ),
        color=ColorConfig(
            d_feature=_lower_get(color, "D_FEATURE", 256),
            mode=_lower_get(color, "MODE", "idr"),
            d_in=_lower_get(color, "D_IN", 9),
            d_out=_lower_get(color, "D_OUT", 3),
            d_hidden=_lower_get(color, "D_HIDDEN", 256),
            n_layers=_lower_get(color, "N_LAYERS", 4),
            weight_norm=_lower_get(color, "WEIGHT_NORM", True),
            multires_view=_lower_get(color, "MULTIRES_VIEW", 4),
            squeeze_out=_lower_get(color, "SQUEEZE_OUT", True),
        ),
        relight=RelightConfig(
            d_in=_lower_get(relight, "D_IN", 6),
            d_out=_lower_get(relight, "D_OUT", 3),
            d_hidden=_lower_get(relight, "D_HIDDEN", 256),
            n_layers=_lower_get(relight, "N_LAYERS", 4),
            y_in_layer=_lower_get(relight, "Y_IN_LAYER", 3),
            multires_view=_lower_get(relight, "MULTIRES_VIEW", 4),
            include_grad=_lower_get(relight, "INCLUDE_GRAD", True),
            inv_sigmoid=_lower_get(relight, "INV_SIGMOID", True),
        ),
        variance=VarianceConfig(init_val=_lower_get(dev, "INIT_VAL", 0.3)),
        nerf=NeRFConfig(
            depth=_lower_get(nerf, "D", 8),
            width=_lower_get(nerf, "W", 256),
            d_in=_lower_get(nerf, "D_IN", 4),
            d_in_view=_lower_get(nerf, "D_IN_VIEW", 3),
            multires=_lower_get(nerf, "MULTIRES", 10),
            multires_view=_lower_get(nerf, "MULTIRES_VIEW", 4),
            skips=_lower_get(nerf, "SKIPS", (4,)),
        ),
    )
