from .catalog import Catalog
from .rest_catalog import RestCatalog
from .rest_server import IcebergRestServer
from .table import LakehouseTable

__all__ = ["Catalog", "IcebergRestServer", "LakehouseTable", "RestCatalog"]
