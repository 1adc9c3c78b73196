from . import emu3_processor, item_processor

__all__ = ["emu3_processor", "item_processor"]
