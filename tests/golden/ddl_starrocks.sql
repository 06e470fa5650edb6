-- External catalog (starocks/mask.sql shape; fill the XX
-- credentials for a cloud warehouse, or serve the warehouse dir
-- through a REST catalog for local use)
CREATE EXTERNAL CATALOG iceberg_catalog
PROPERTIES (
    "type" = "iceberg",
    "iceberg.catalog.type" = "rest",
    "iceberg.catalog.uri" = "http://XXX:8181",
    "iceberg.catalog.warehouse" = "s3://XXX/warehouse/"
);

SHOW TABLES IN iceberg_catalog.db;
SELECT * FROM iceberg_catalog.db.silver_orders;
SELECT COUNT(*) FROM iceberg_catalog.db.silver_orders;
