from .rewrite import apply_transfer

__all__ = ["apply_transfer"]
