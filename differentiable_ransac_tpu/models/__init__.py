from differentiable_ransac_tpu.models.clnet import CLNet, DSBlock
