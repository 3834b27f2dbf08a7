from .catalog import Catalog
from .table import LakehouseTable

__all__ = ["Catalog", "LakehouseTable"]
