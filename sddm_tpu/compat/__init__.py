from .torch_import import import_unet_modified2_state

__all__ = ["import_unet_modified2_state"]
