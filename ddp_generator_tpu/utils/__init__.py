from .tree import tree_where, tree_zeros_like_shape

__all__ = ["tree_where", "tree_zeros_like_shape"]
