from differentiable_ransac_tpu.solvers.fundamental import (
    fundamental_7pt,
    fundamental_8pt,
    fundamental_nonminimal,
)
from differentiable_ransac_tpu.solvers.essential import (
    essential_5pt_nister,
    essential_nonminimal,
)
from differentiable_ransac_tpu.solvers.rigid import rigid_3pt, rigid_nonminimal
