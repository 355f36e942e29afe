"""orb_slam2_test_tpu — a TPU-native visual SLAM engine.

A from-scratch reimplementation of the full ORB-SLAM2 pipeline
(reference: HugoNip/ORB_SLAM2_test, i.e. canonical ORB-SLAM2,
Mur-Artal & Tardos, IEEE TRO 2017) designed TPU-first:

- ORB feature extraction (FAST + oriented BRIEF over an image pyramid)
  as batched XLA/Pallas programs with static shapes and masking.
- Descriptor matching as MXU matmuls over bipolar-unpacked 256-bit
  descriptors (Hamming distance = (256 - dot)/2).
- Motion-only / local / global bundle adjustment as a JAX
  Levenberg-Marquardt solver with Schur-complement reduction,
  replacing g2o.
- The map as a struct-of-arrays pytree with fixed capacities and
  validity masks instead of a pointer graph with mutexes.
- Multi-host scaling via jax.sharding.Mesh + shard_map with psum /
  all_gather collectives for distributed BA (replacing the
  reference's pthread + shared-memory concurrency).

Layer map (mirrors SURVEY.md section 1):
  geometry/   L3 math: SE3/Sim3, cameras, triangulation, robust losses
  ops/        L3 kernels: pyramid, FAST, BRIEF, matching (+ ops/pallas)
  solvers/    L3: GN/LM, pose opt, local/global BA, H/F/PnP/Sim3 RANSAC
  slam_map/   L2 data model: MapState pytree, covisibility, KF database
  bow/        L1-equivalent: vocabulary tree as arrays, batched transform
  engine/     L4/L5: Frame, Tracking, LocalMapping, LoopClosing, System
  parallel/   multi-chip: meshes, distributed BA
  io/         L6: dataset loaders, trajectory export, checkpointing
  viz/        map/trajectory rendering (matplotlib, no Pangolin)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the CLI drivers are separate
# processes, and without this every run re-pays minutes of compiles
# for identical programs (the reference's analog is its one-off
# -O3 build; our "build" happens at trace time and is cached here).
# Best-effort: some backends/versions reject the options.
def _enable_compilation_cache() -> None:
    import os

    if os.environ.get("SLAM_JAX_CACHE") == "off":
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "SLAM_JAX_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "orb_slam2_test_tpu_xla"
            ),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_compilation_cache()
