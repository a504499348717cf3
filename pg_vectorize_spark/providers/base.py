"""Provider interfaces.

Shape mirrors the reference's ``EmbeddingProvider`` trait
(core/src/transformers/providers/mod.rs:19-28):
``generate_embedding(request) -> Vec<Vec<f64>>`` and
``model_dim(name) -> u32``; chat providers add
``generate_response(model, messages)`` (openai.rs:140-164).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Sequence


class EmbeddingProvider(ABC):
    """Turns a batch of strings into a batch of float vectors."""

    @abstractmethod
    def generate_embedding(self, inputs: Sequence[str]) -> list[list[float]]:
        """Embed each input; returns one vector per input, order-preserving."""

    @abstractmethod
    def model_dim(self) -> int:
        """Vector dimension for this provider/model."""


class ChatProvider(ABC):
    """One-shot chat completion (for generate()/rag())."""

    @abstractmethod
    def generate_response(self, messages: list[dict[str, str]]) -> str:
        """messages = [{'role': 'system'|'user', 'content': str}, ...]."""
