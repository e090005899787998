"""Multi-host / multi-chip parallelism.

Import submodules directly (``parallel.dist``, ``parallel.mesh``) — this
package deliberately re-exports nothing: ``mesh`` pulls in the device
kernels, whose module-level jnp constants initialize the XLA backend, and
``dist.initialize`` must run *before* that happens in multi-process runs.
"""
