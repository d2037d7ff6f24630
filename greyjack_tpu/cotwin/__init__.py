from greyjack_tpu.cotwin.cotwin import Cotwin
from greyjack_tpu.cotwin.cotwin_entity import CotwinEntity
from greyjack_tpu.cotwin.cotwin_builder import CotwinBuilderBase

__all__ = ["Cotwin", "CotwinEntity", "CotwinBuilderBase"]
