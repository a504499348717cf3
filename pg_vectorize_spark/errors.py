"""Engine error types.

Mirrors the error surface of the reference: invalid identifiers, invalid
filter strings, unknown jobs, model-name parse failures
(reference: core/src/query.rs:194-203, core/src/query.rs:82-182,
server/src/errors.rs).
"""


class VectorizeError(Exception):
    """Base class for all engine errors."""


class InvalidIdentifierError(VectorizeError):
    """Identifier contains characters outside [A-Za-z0-9_]."""


class FilterParseError(VectorizeError):
    """A filter string like ``"gte.25"`` could not be parsed."""


class JobNotFoundError(VectorizeError):
    """Job name not present in the catalog."""


class JobAlreadyExistsError(VectorizeError):
    """Job name already present in the catalog."""


class ModelError(VectorizeError):
    """Model name could not be parsed or provider is unknown."""


class ProviderError(VectorizeError):
    """An embedding/chat provider call failed."""
