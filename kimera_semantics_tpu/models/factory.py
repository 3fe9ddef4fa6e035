"""Integrator factory — string/enum -> integrator instance.

Equivalent of `SemanticTsdfIntegratorFactory::create`
(kimera_semantics/src/semantic_tsdf_integrator_factory.cpp:65-88): both
integrators share one API so servers/pipelines use them interchangeably.
"""

from __future__ import annotations

from typing import Union

from ..config import FusionConfig, IntegratorType
from ..core.camera import PinholeIntrinsics
from .fast import FastSemanticTsdfIntegrator
from .merged import MergedSemanticTsdfIntegrator
from .projective import ProjectiveSemanticTsdfIntegrator
from .simple import SimpleSemanticTsdfIntegrator


def create(kind: Union[str, IntegratorType], cfg: FusionConfig,
           intr: PinholeIntrinsics):
    if isinstance(kind, str):
        kind = IntegratorType(kind)
    if kind == IntegratorType.FAST:
        return FastSemanticTsdfIntegrator(cfg, intr)
    if kind == IntegratorType.MERGED:
        return MergedSemanticTsdfIntegrator(cfg, intr)
    if kind == IntegratorType.SIMPLE:
        return SimpleSemanticTsdfIntegrator(cfg, intr)
    if kind == IntegratorType.PROJECTIVE:
        return ProjectiveSemanticTsdfIntegrator(cfg, intr)
    raise ValueError(f"unknown integrator type: {kind}")
