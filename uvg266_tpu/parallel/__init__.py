"""Multi-chip parallelism: mesh-sharded phase-1 search over
('gop', 'tile') axes. See mesh.py."""
from .mesh import MeshEncoder, build_mesh, tile_grid_for

__all__ = ["MeshEncoder", "build_mesh", "tile_grid_for"]
