"""gnn_tpu — a TPU-native graph neural network framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of the
walexi/gnn.cpp reference (see SURVEY.md): tensors/autograd via jax.grad,
NN modules as pytrees, graphs as HBM-resident CSR, message passing as
SpMM/SDDMM/segment kernels, and scaling via jax.sharding meshes.
"""

__version__ = "0.1.0"

from gnn_tpu import graphs, models, mp, nn, ops, optim

__all__ = ["graphs", "models", "mp", "nn", "ops", "optim", "__version__"]
