"""One typed configuration surface for the whole framework.

Replaces the reference's two argparse surfaces (networks/config.py executed
at import; per-driver __main__ argparse blocks) and its hard-coded constants
(seq_len/overlap/dilation at optimizer.py:328-330, weight rescalings at
optimizer.py:352-358, heatmap geometry constants at optimizer.py:133-144).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class WindowConfig:
    seq_len: int = 10
    overlap: int = 2

    @property
    def stride(self) -> int:
        return self.seq_len - self.overlap


@dataclass(frozen=True)
class SolverConfig:
    """Latent solver settings (reference torch LBFGS: optimizer.py:261-262)."""
    method: str = "lbfgs"          # 'lbfgs' | 'lbfgs_fixed' | 'adam'
    lr: float = 2.0
    max_iter: int = 25
    history_size: int = 25
    tolerance_change: float = 1e-6
    tolerance_grad: float = 1e-7
    max_ls_evals: int = 25
    adam_steps: int = 150
    adam_lr: float = 0.05
    # latent init: 'mu' (deterministic encoder mean, this rebuild's
    # default) or 'sample' (the reference's reparameterized sample init,
    # optimizer.py:257 / SeqConvVAE.py:159-169 — stochastic, keyed by
    # init_seed for reproducibility)
    init: str = "mu"
    init_seed: int = 0
    # fixed-solver parallel line search candidates (fractions of lr)
    step_candidates: tuple = (1.0, 0.5, 0.1, 0.02)
    # fixed solver: evaluate value_and_grad at all candidates in the one
    # batched call instead of probing values then re-evaluating at the
    # accepted point (identical trajectory, fewer latency-bound evals)
    fused_probes: bool = False
    # fixed solver: compute the L-BFGS direction via the compact (matrix)
    # representation instead of the sequential two-loop recursion —
    # algebraically identical, ~8 kernels instead of ~2*history tiny ones
    compact_direction: bool = False
    # fixed solver: pointer-indexed circular history — one O(d) row write
    # per iteration instead of three O(m*d) jnp.roll buffer rotations
    # (identical trajectories, tests/test_lbfgs_fixed.py)
    circular_history: bool = False
    # fixed solver: fuse the whole two-loop recursion into one Pallas
    # kernel per lane (VMEM-resident; the sequential dots are otherwise
    # launch-latency-bound — 0.614 of 1.73 ms/iteration at the production
    # batch, intercept_probe.json); identical math incl. slot masking
    pallas_direction: bool = False
    # rematerialize the decoder in the backward pass (trades FLOPs for HBM,
    # for very large window batches)
    remat: bool = False
    # fixed solver: compute the ENTIRE post-decode stage-1 energy (fisheye
    # projection + crop sampling + 3d/accel/bone/vae + reductions) and its
    # analytic gradient in ONE Pallas kernel per objective eval
    # (ops/pallas/fused_energy.py), via the explicitly-batched solver.
    # Requires lbfgs_fixed + reproj + heatmap_crop + f32 maps; other
    # configurations fall back to the XLA path.  Stages the kernel cannot
    # serve (e.g. the no-reproj global stage) still run the explicitly-
    # batched solver with the XLA energy.
    fused_energy: bool = False
    # fixed solver: run the explicitly-batched solver with the XLA energy
    # (no Pallas kernel) — the solver-restructuring share of the fused
    # path, available for any stage/sampling configuration
    batched_solver: bool = False
    # with fused_energy: ALSO fuse the conv-decoder chain into the kernel
    # (ops/pallas/fused_decode_energy.py) — one objective eval becomes
    # one XLA latent matmul + ONE kernel + one transpose matmul
    fused_decode: bool = False
    # fixed solver: lax.scan unroll factor for the iteration loop.  The
    # per-iteration cost is kernel-dispatch-bound (~30 kernels x tens of
    # us; iter_decomp_r3.json), so unrolling lets XLA fuse across
    # iteration boundaries at the cost of program size / compile time.
    unroll: int = 1
    # stage-2 (global) iteration override: None = max_iter (reference
    # parity — both stages run the same budget, optimizer.py:261).  The
    # residual global stage makes small tangent-space corrections from an
    # exact init, so it can converge in fewer iterations than the local
    # stage; each stage-2 iteration costs ~0.9 ms of launch time
    # (iter_decomp_r3.json).
    global_max_iter: int | None = None


@dataclass(frozen=True)
class EnergyConfig:
    """CLI-level energy weights (reference defaults:
    optimize_whole_sequence.py:14-19).  Stage-specific rescalings
    (optimizer.py:352-358) are applied by the pipeline."""
    vae: float = 0.0
    gmm: float = 0.0
    smooth: float = 0.001
    bone_length: float = 0.01
    weight_3d: float = 0.01
    reproj: float = 0.01
    # anchor-to-presmoothed-input term (the reference's soft_smooth_energy,
    # optimizer.py:188-192: each window's input is Gaussian-smoothed,
    # optimizer.py:382-383, and passed as the solver's third argument —
    # though the reference never adds the term to total_loss).  > 0 wires
    # it in; the smoothing sigma is OptimizeConfig.input_smooth_sigma.
    soft_smooth: float = 0.0
    # cross-window coupling (> 0 switches each stage to ONE joint
    # whole-sequence solve over all window latents; no reference
    # equivalent — enabled by batching the windows)
    overlap_consistency: float = 0.0
    # explicit stage-2 (global) weight overrides.  The reference hard-codes
    # the global stage to {3d: weight_3d, smooth: smooth, bone: 0.01}
    # (optimizer.py:352-353); None keeps that split, a value replaces it —
    # the lever for tuning the global-prior stage independently
    # (stage2_experiment.json)
    global_weight_3d: float | None = None
    global_smooth: float | None = None
    # residual parametrization of the global stage: the stage-2 output is
    # p(z) = mid + decode(z) - decode(z0) instead of decode(z), so the
    # stage is EXACT at its init (p(z0) = mid) and the optimization can
    # only move away from the stage-1 result where the energy (smoothness/
    # bone/anchor) says so.  Removes the global prior's decode floor —
    # the reference's own stage-2 regression mode (its tripwire at
    # optimize_whole_sequence.py:87-88 fires when re-decoding costs more
    # than trajectory correction gains) — while corrections stay in the
    # prior's tangent space.  No reference equivalent.
    global_residual: bool = False
    # same residual parametrization for STAGE 1 (local stage):
    # p(z) = estimate + decode(z) - decode(z0).  Experimental — unlike
    # stage 2, stage 1's job is DENOISING the estimate through the prior
    # manifold, and the residual form keeps the estimate's noise unless
    # the reproj/smooth terms remove it (quality probe:
    # quality_iter_crop.py QIC_ONLY=residual s1 arms)
    local_residual: bool = False


@dataclass(frozen=True)
class HeatmapGeometry:
    """Constants tying the 64x64 heatmaps to the 1280x1024 fisheye image
    (reference: optimizer.py:133-144): heatmaps were predicted on the
    1024x1024 center crop, so x shifts by -crop_offset and coordinates
    normalize by (p - half) / half."""
    crop_offset: float = 128.0
    half_extent: float = 512.0


@dataclass(frozen=True)
class PriorConfig:
    latent_dim: int = 2048
    seq_len: int = 10
    hidden_dims: tuple = (64, 64, 128, 256, 512)
    in_channels: int = 45


@dataclass(frozen=True)
class OptimizeConfig:
    window: WindowConfig = field(default_factory=WindowConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    energy: EnergyConfig = field(default_factory=EnergyConfig)
    prior: PriorConfig = field(default_factory=PriorConfig)
    heatmap: HeatmapGeometry = field(default_factory=HeatmapGeometry)
    camera: str = "egosyn"          # built-in name or a calibration path
    sampling_impl: str = "gather"   # heatmap sampling: 'gather' | 'dense'
    # storage dtype of the heatmaps inside the solver: 'bfloat16' halves
    # the HBM traffic of the sampling path (the dominant eval cost,
    # solver_floor_noreproj.json); sampling weights/accumulation stay f32.
    # The fused mega-kernel accepts bf16 crops too (one whole-block
    # convert in-kernel; energy math stays f32 — heat_dtype_ab.json)
    heatmap_dtype: str = "float32"
    # > 0: crop each heatmap to a k x k window around its peak before the
    # solve (once per launch).  The maps are Gaussian blobs, so the crop
    # carries all non-negligible mass; shrinks the sampling working set,
    # which dominates the eval cost.  0 = full maps (exact reference
    # semantics).
    heatmap_crop: int = 0
    # fold eval-mode BatchNorm into the conv weights (exact; removes the
    # runtime BN ops from every latency-bound objective eval)
    fold_bn: bool = False
    # run the decoder as a banded-matmul chain (one MXU matmul per layer
    # instead of conv+bias+activation kernels; exact re-association of the
    # k=3/stride-1 conv stack — see models/dense_decoder.py)
    dense_decoder: bool = False
    # decoder implementation override: '' (derive from dense_decoder),
    # 'conv' (flax conv stack), 'dense' (banded matmuls), 'shift'
    # (3 shift-matmuls per layer — band-matmul kernel economy without its
    # FLOP/weight-traffic inflation; see models/dense_decoder.py)
    decoder_impl: str = ""
    # storage dtype of the dense/shift decoder weights: 'bfloat16' halves
    # their HBM streaming at unchanged MXU matmul precision (the TPU
    # default matmul precision is bf16 anyway); outputs stay float32
    decoder_dtype: str = "float32"
    final_smooth: bool = True
    final_smooth_sigma: float = 1.0
    # 'gaussian' (reference behaviour, optimizer.py:448-450) or 'one_euro'
    # (the adaptive filter the reference imports but never wires in,
    # optimizer.py:30)
    final_smooth_method: str = "gaussian"
    # sigma of the per-window input pre-smoothing that feeds the
    # soft-smooth anchor (reference: optimizer.py:382-383); active only
    # when energy.soft_smooth > 0
    input_smooth_sigma: float = 1.0
    # heatmap_crop safety guard: when > 0, each launch checks (host-side,
    # once per chunk) that the peak-centered k x k crops retain at least
    # this fraction of every map's probability mass; chunks with
    # multimodal/flattened maps below the threshold fall back to full-map
    # sampling instead of silently discarding secondary modes
    heatmap_crop_min_mass: float = 0.90
    # when the crop-mass guard trips (degraded/multimodal maps), also
    # switch the fixed solver to the robust tier (history>=10, 4 parity
    # line-search candidates): measured better aligned accuracy on the
    # degraded v2 corpus at ~15% speed cost, never affects clean corpora
    robust_tier_on_guard: bool = True
    # guard-trip FAST PATH: when > 0, a tripped crop-mass guard stages
    # k=guard_crop crops centered at the PROJECTED INITIAL ESTIMATE
    # instead of falling back to full maps.  Peak-centering fails on
    # multimodal maps because argmax may pick a distractor mode — but the
    # solver only ever samples near the projected estimate (latent moves
    # are a few pixels), so estimate-centered crops keep the sampled
    # neighbourhood (and its gradients) while staying on the fused-kernel
    # path.  0 = reference-parity full-map fallback.
    guard_crop: int = 0
    # crop centering for staging: 'peak' (argmax, the fast-tier default)
    # or 'estimate' (projected initial estimate — what the guard-trip
    # fast path switches to; resolved by driver._cfg_for_coverage)
    crop_center: str = "peak"
    merge: bool = True
    # post-solve window merging as ONE precomputed (covered, W*T) matmul
    # per merged field instead of scatter-add/count/divide dispatches,
    # with the final gaussian smoothing folded into the optimized field's
    # matrix (both are linear maps along time with static coefficients —
    # exact re-association, tests/test_window_metrics.py).  The launch
    # intercept is dispatch-bound (intercept_probe_r3.json: merge+smooth
    # 0.81 ms of the ~8 ms in-program intercept), so fewer kernels win.
    matmul_merge: bool = True
    # solve-time activation dtype (params stay f32).  Tiers, from most to
    # least f32 (see pipeline.optimize_stage): 'float32' (parity),
    # 'bfloat16' (the quality-gated MIXED production tier: bf16 solver
    # evals, f32 encode + f32 output decode/offset), 'bfloat16_f32enc'
    # (only the encode f32), 'bfloat16_f32head' (only the fc_mu init head
    # f32), 'bfloat16_delta' (f32 encode/output + bf16 SOLVER STATE as a
    # delta around the f32 mu — the pure tier's speed with an exact
    # init; dtype_tier_ab.json), 'bfloat16_pure' (everything bf16).
    compute_dtype: str = "float32"
    # stage() segmenting: a single staging program takes one FULL-map
    # argument per chunk, and the AOT compiler accounts each argument
    # distinctly — 640 chunks = 18.75G of "arguments" and an HBM OOM at
    # compile time even when the runtime buffers alias (the tiled A/B
    # pool).  Above this many chunks, stage() runs the (identical)
    # staging program per segment and concatenates the staged outputs —
    # bit-exact, and the staged crops are ~64x smaller than the maps.
    # heat_ceiling_probe.json re-diagnosed the old "solve-temp OOM"
    # (unroll_chunks_flat2.json) as exactly this argument accounting.
    stage_segment_chunks: int = 384
    # crop-extraction formulation inside the staging program ('gather' =
    # two chained take_along_axis, 'flat' = one flat-index gather,
    # 'onehot' = row/col selector matmuls on the MXU) — bit-exact across
    # impls (tests/test_heatmap_crop.py), so this is a pure program
    # choice.  serving_batch_ab.json measured sustained serving
    # saturating at ~15.2k w/s independent of batch shape (per-window-
    # bound, staging the growing share); stage_impl_ab.json (same
    # healthy session, c112/depth3): the interleaved serving loop runs
    # 22042 w/s with 'onehot' vs 15172 'gather' (+45%) and 5999 'flat'
    # — TPU gathers lose to selector matmuls decisively.  Default since
    # round 5.
    stage_crop_impl: str = "onehot"


@dataclass(frozen=True)
class TrainConfig:
    """VAE training settings (reference: networks/config.py + the four
    launch .sh scripts: latent 2048, kl 0.5, seq 10, batch 64, fps 25)."""
    train_data_path: str = ""
    latent_dim: int = 2048
    seq_length: int = 10
    fps: int = 25
    kl_weight: float = 0.5
    epochs: int = 20
    batch_size: int = 64
    learning_rate: float = 1e-4
    # 'constant' (reference behaviour, networks/train.py Adam with fixed
    # lr) or 'cosine' (decay to lr_final over the run; stabilizes long
    # runs on small corpora where a fixed lr oscillates — see
    # prior_recon_sweep.json)
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_final: float = 0.0
    # initial bias of the VAE's log-variance head (ConvVAE.logvar_bias_init):
    # negative values start the posterior near-deterministic, which
    # converges much faster on small corpora (prior_floor_experiment.json)
    logvar_init_bias: float = 0.0
    # conv-stack compute dtype: 'bfloat16' runs the encoder/decoder
    # matmuls on the MXU in bf16 (params, optimizer state and the loss
    # stay f32) — measured in train_perf_r3.json
    compute_dtype: str = "float32"
    weight_decay: float = 0.0
    slide_window_step: int = 1
    data_balance: bool = False
    with_mo2cap2_data: bool = False
    local_pose: bool = False        # local-pose VAE vs relative-global VAE
    log_dir: str = "logs"
    log_step: int = 100
    seed: int = 0
    num_devices: int = 0            # 0 = all available (data parallel)
    # run each epoch as ONE device launch (lax.scan over the shuffled
    # full batches) instead of one dispatch per step — identical math
    # and batch order (tests/test_train.py asserts parity with the
    # eager loop); metrics/log_step granularity becomes per-epoch
    epoch_scan: bool = False
    # epoch_scan host-memory bound: scan in blocks of at most this many
    # steps (a streaming HDF5 corpus must not materialize a whole epoch);
    # trailing sub-block steps run eagerly so only one scan shape compiles
    scan_block: int = 256
    # evaluate every N epochs (always on the last); per-epoch evaluation
    # is a host sync + a full test pass — the dominant cost of short
    # epochs on small corpora
    eval_every: int = 1


def with_overrides(cfg, **kwargs):
    """Functional update helper for frozen configs."""
    return replace(cfg, **kwargs)
