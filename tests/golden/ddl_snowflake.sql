-- External volume over the warehouse location (see
-- snowflake/demo.sql steps 3-4 for the IAM trust handshake)
CREATE OR REPLACE EXTERNAL VOLUME ext_vol
STORAGE_LOCATIONS = (
    (
        NAME = 'warehouse',
        STORAGE_PROVIDER = 'S3',
        STORAGE_BASE_URL = 's3://XXX/warehouse/',
        STORAGE_AWS_ROLE_ARN = 'arn:aws:iam::XXX:role/snowflake_role',
        STORAGE_AWS_EXTERNAL_ID = 'ext_vol'
    )
);

-- No Glue here: the table is filesystem-cataloged, so attach the
-- metadata file directly through an OBJECT_STORE integration
CREATE OR REPLACE CATALOG INTEGRATION obj_store_integ
  CATALOG_SOURCE = OBJECT_STORE
  TABLE_FORMAT = ICEBERG
  ENABLED = TRUE;

CREATE OR REPLACE ICEBERG TABLE silver_orders
  EXTERNAL_VOLUME = 'ext_vol'
  CATALOG = 'obj_store_integ'
  METADATA_FILE_PATH = 'metadata/v3.metadata.json';

SELECT * FROM silver_orders;
