"""Custom exception types (ref: ultralytics/utils/errors.py:1-43).

The reference defines HUBModelError for model-fetch failures against its hub;
kept here so calling code migrating from the reference can keep its except
clauses. Raised by hub.Auth/HUBTrainingSession when an api_root is configured
but the endpoint rejects the model or credentials.
"""

from __future__ import annotations


class HUBModelError(Exception):
    """A model could not be found or retrieved from the hub (ref errors.py:6)."""

    def __init__(self, message: str = "Model not found. Please check model URL and try again."):
        super().__init__(message)
