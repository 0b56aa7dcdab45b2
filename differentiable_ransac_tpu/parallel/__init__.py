from differentiable_ransac_tpu.parallel.mesh import (
    mesh_from_spec,
    initialize_distributed,
    make_mesh,
    sharded_ransac,
    sharded_ransac_adaptive,
    sharded_hypothesis_losses,
    sharded_rigid_residual_loss,
    sharded_match_loss_hypotheses,
)
