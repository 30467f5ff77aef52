from .beam_search import beam_search, greedy_decode
from .guided import guided_hook_builder

__all__ = ["beam_search", "greedy_decode", "guided_hook_builder"]
