from .mesh import make_mesh, sharded_locate, sharded_step
