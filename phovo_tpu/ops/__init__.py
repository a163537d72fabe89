from phovo_tpu.ops import se3, camera, pyramid, warp, residuals  # noqa: F401
