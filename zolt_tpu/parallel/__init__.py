from .mesh import AXIS, make_mesh, make_sharded_product_round, shard_table

__all__ = ["AXIS", "make_mesh", "make_sharded_product_round", "shard_table"]
