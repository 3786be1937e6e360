"""Feature registry (SURVEY.md §2.5 S3 + §2.4 V12).

The reference collects features by walking ``features.contrib``
packages and importing one Feature per ``user_*/feature_*.py`` module
(ballet/contrib.py:19-122), and validates submission structure with
naming checks (ballet/validation/project_structure/checks.py:25-98).
The engine replaces git/module plumbing with an in-code registry:
features register under ``<owner>/<feature_name>`` ids, registration
enforces the structural rules (V12 analog: id shape, owner prefix,
uniqueness), and :meth:`collect` returns features for materialization
— the shape a ``--py-files``-shipped feature module list plugs into.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ballet_spark.core import Feature

_ID_RE = re.compile(r"^(?P<owner>[a-z][a-z0-9_]*)/(?P<name>feature_[a-z0-9_]+)$")


class RegistrationError(ValueError):
    """Feature id/shape violates the registry rules."""


@dataclass
class FeatureRegistry:
    """id → Feature map with V12-style structural checks."""

    features: dict[str, Feature] = field(default_factory=dict)

    def register(self, feature_id: str, feature: Feature) -> Feature:
        m = _ID_RE.match(feature_id)
        if not m:
            raise RegistrationError(
                f"feature id {feature_id!r} must match "
                f"'<owner>/feature_<name>' (lowercase, [a-z0-9_])"
            )
        if feature_id in self.features:
            raise RegistrationError(f"{feature_id!r} is already registered")
        if not isinstance(feature, Feature):
            raise RegistrationError(
                f"{feature_id!r}: expected a Feature, got {type(feature).__name__}"
            )
        # stamp a COPY: mutating the caller's object would silently
        # re-stamp provenance if the same Feature is registered twice
        # (both registry entries would then claim the second id)
        import dataclasses

        stamped = dataclasses.replace(feature)
        stamped.source = feature_id  # provenance stamp (ballet/contrib.py)
        self.features[feature_id] = stamped
        return stamped

    def collect(self, owner: str | None = None) -> list[Feature]:
        """All features (optionally one owner's) in registration order
        (the engine analog of collect_contrib_features)."""
        return [
            f
            for fid, f in self.features.items()
            if owner is None or fid.startswith(f"{owner}/")
        ]

    def deregister(self, feature_id: str) -> Feature:
        if feature_id not in self.features:
            raise KeyError(feature_id)
        return self.features.pop(feature_id)

    def __len__(self) -> int:
        return len(self.features)

    def __contains__(self, feature_id: str) -> bool:
        return feature_id in self.features
