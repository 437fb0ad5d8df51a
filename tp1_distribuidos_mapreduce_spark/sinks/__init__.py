from .textkv import read_kv_text, write_sorted_kv_text

__all__ = ["write_sorted_kv_text", "read_kv_text"]
