from greyjack_tpu.domain.domain_builder import DomainBuilderBase

__all__ = ["DomainBuilderBase"]
