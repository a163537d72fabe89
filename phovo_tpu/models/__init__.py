from phovo_tpu.models.base import AlignmentResult, PhotoconsistencyOdometryBase  # noqa: F401
from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic  # noqa: F401
from phovo_tpu.models.autodiff import PhotoconsistencyOdometryAutodiff  # noqa: F401
from phovo_tpu.models.biobjective import PhotoconsistencyOdometryBiObjective  # noqa: F401
from phovo_tpu.models.ic import PhotoconsistencyOdometryIC  # noqa: F401

BACKENDS = {
    "analytic": PhotoconsistencyOdometryAnalytic,
    "autodiff": PhotoconsistencyOdometryAutodiff,
    "ceres": PhotoconsistencyOdometryAutodiff,  # reference naming alias
    "biobjective": PhotoconsistencyOdometryBiObjective,
    "ic": PhotoconsistencyOdometryIC,  # inverse-compositional (extension)
}
