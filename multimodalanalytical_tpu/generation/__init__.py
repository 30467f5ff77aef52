from .beam_search import beam_search, greedy_decode

__all__ = ["beam_search", "greedy_decode"]
