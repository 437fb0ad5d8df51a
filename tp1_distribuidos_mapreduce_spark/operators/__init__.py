from .wordcount import inverted_index, word_count

__all__ = ["word_count", "inverted_index"]
