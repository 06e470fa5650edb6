INSTALL iceberg;
LOAD iceberg;
SELECT * FROM iceberg_scan('/warehouse/silver/metadata/v3.metadata.json');
SELECT COUNT(*) FROM iceberg_scan('/warehouse/silver/metadata/v3.metadata.json');
