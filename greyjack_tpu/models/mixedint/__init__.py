from greyjack_tpu.models.mixedint.model import (
    MixedIntDomain,
    DomainBuilder,
    CotwinBuilder,
)

__all__ = ["MixedIntDomain", "DomainBuilder", "CotwinBuilder"]
