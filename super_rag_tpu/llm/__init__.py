from super_rag_tpu.llm.errors import (
    LLMError,
    AuthenticationError,
    RateLimitError,
    ContextWindowExceededError,
    ProviderUnavailableError,
    is_retryable_error,
    wrap_provider_error,
)
from super_rag_tpu.llm.client import OpenAICompatClient
from super_rag_tpu.llm.resolver import ModelResolver

__all__ = [
    "LLMError", "AuthenticationError", "RateLimitError",
    "ContextWindowExceededError", "ProviderUnavailableError",
    "is_retryable_error", "wrap_provider_error",
    "OpenAICompatClient", "ModelResolver",
]
