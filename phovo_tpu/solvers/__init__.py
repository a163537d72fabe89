from phovo_tpu.solvers.gauss_newton import gauss_newton_level, GNLevelResult  # noqa: F401
from phovo_tpu.solvers.trust_region import trust_region_level, TRLevelResult  # noqa: F401
