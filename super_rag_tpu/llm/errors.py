"""LLM provider error taxonomy.

Counterpart of the reference's llm/llm_error_types.py (398 LoC: full
error taxonomy + wrap_litellm_error + is_retryable_error).  Errors wrap
raw provider/HTTP failures into typed exceptions the retry logic and the
graceful-degradation paths can reason about.
"""

from __future__ import annotations

from typing import Optional


class LLMError(Exception):
    retryable = False

    def __init__(self, message: str, provider: str = "", model: str = "",
                 status_code: Optional[int] = None):
        super().__init__(message)
        self.provider = provider
        self.model = model
        self.status_code = status_code


class AuthenticationError(LLMError):
    retryable = False


class PermissionError_(LLMError):
    retryable = False


class NotFoundError(LLMError):
    retryable = False


class BadRequestError(LLMError):
    retryable = False


class ContextWindowExceededError(BadRequestError):
    retryable = False


class RateLimitError(LLMError):
    retryable = True


class TimeoutError_(LLMError):
    retryable = True


class ProviderUnavailableError(LLMError):
    retryable = True


class ConnectionError_(LLMError):
    retryable = True


def is_retryable_error(err: Exception) -> bool:
    return isinstance(err, LLMError) and err.retryable


def wrap_provider_error(err: Exception, provider: str = "",
                        model: str = "") -> LLMError:
    """Classify an httpx / provider exception into the taxonomy."""
    import httpx

    if isinstance(err, LLMError):
        return err
    if isinstance(err, httpx.TimeoutException):
        return TimeoutError_(str(err), provider, model)
    if isinstance(err, httpx.ConnectError):
        return ConnectionError_(str(err), provider, model)
    if isinstance(err, httpx.HTTPStatusError):
        sc = err.response.status_code
        msg = err.response.text[:500]
        if sc == 401:
            return AuthenticationError(msg, provider, model, sc)
        if sc == 403:
            return PermissionError_(msg, provider, model, sc)
        if sc == 404:
            return NotFoundError(msg, provider, model, sc)
        if sc == 429:
            return RateLimitError(msg, provider, model, sc)
        if sc == 400:
            if "context" in msg.lower() and "length" in msg.lower():
                return ContextWindowExceededError(msg, provider, model, sc)
            return BadRequestError(msg, provider, model, sc)
        if sc >= 500:
            return ProviderUnavailableError(msg, provider, model, sc)
        return LLMError(msg, provider, model, sc)
    return LLMError(str(err), provider, model)
