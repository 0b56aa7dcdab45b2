from differentiable_ransac_tpu.ops import epipolar, linalg, metrics, polynomial, pose
