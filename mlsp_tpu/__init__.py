"""mlsp_tpu — a TPU-native (JAX/XLA/Pallas) framework for unsupervised domain
adaptation on point clouds, providing the full capability surface of the
VITA-Group/MLSP reference (ECCV 2022, "Point Cloud Domain Adaptation via
Masked Local 3D Structure Prediction").

Design: everything hot runs inside `jax.jit` on device — farthest-point
sampling, kNN graphs, surface-normal and cardinality (density) ground-truth
generation (replacing the reference's CUDA pointnet2_ops / KNN_CUDA / C++ PCL
dependencies), region masking/deformation, Chamfer losses, and the full
train step. Data parallelism is expressed with `jax.sharding` over a device
mesh; XLA inserts the collectives.

Subpackages
-----------
ops         device kernels: pairwise distance, knn, fps, normals, density,
            chamfer, ball-query/grouping (XLA + Pallas variants)
transforms  pure-function augmentations and SSL corruptions (deform, scan)
models      flax.linen models: PointNet, DGCNN, heads, seg DGCNN, PointNet++
losses      DefRec/chamfer, normal, density (KL+L1), PCM mixup, CE
data        PointDA-10 / PointSegDA datasets, synthetic data, pipelines
parallel    mesh + sharding helpers (dp axis; multi-host ready)
train       train states, jitted train steps, trainers, SPST self-training
utils       logging, metrics, checkpointing, configs
"""

__version__ = "0.1.0"
