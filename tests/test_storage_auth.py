"""Credential → Hadoop conf mapping (reference AzureBlobStorageReader /
S3ClientSettings auth surface)."""

import pytest

from arcane_framework_scala_spark.sources.storage_auth import (
    AzureStorageSettings,
    S3StorageSettings,
    apply_storage_auth,
)


def test_azure_shared_key_mapping():
    conf = AzureStorageSettings(
        account_name="acct", access_key="sekret=="
    ).hadoop_conf()
    assert conf["fs.azure.account.key.acct.dfs.core.windows.net"] == "sekret=="
    assert (
        conf["fs.azure.account.auth.type.acct.dfs.core.windows.net"]
        == "SharedKey"
    )


def test_azure_sas_mapping_strips_query_prefix():
    conf = AzureStorageSettings(
        account_name="acct", sas_token="?sv=2024&sig=abc"
    ).hadoop_conf()
    assert conf["fs.azure.sas.fixed.token.acct.dfs.core.windows.net"] == (
        "sv=2024&sig=abc"
    )
    assert conf["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "SAS"


def test_azure_default_credential_and_exclusivity():
    conf = AzureStorageSettings(account_name="acct").hadoop_conf()
    assert conf["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "OAuth"
    with pytest.raises(ValueError):
        AzureStorageSettings(
            account_name="acct", access_key="k", sas_token="t"
        ).hadoop_conf()


def test_azure_env_fallback_matches_reference_variable():
    s = AzureStorageSettings.from_env(
        "acct", env={"ARCANE_FRAMEWORK__AZURE_STORAGE_ACCESS_KEY": "envkey"}
    )
    assert s.access_key == "envkey"


def test_s3_mapping_full():
    conf = S3StorageSettings(
        access_key_id="AKIA",
        secret_access_key="sk",
        session_token="tok",
        region="eu-west-1",
        endpoint="https://minio.local:9000",
        path_style_access=True,
    ).hadoop_conf()
    assert conf["fs.s3a.access.key"] == "AKIA"
    assert conf["fs.s3a.secret.key"] == "sk"
    assert conf["fs.s3a.session.token"] == "tok"
    assert "TemporaryAWSCredentialsProvider" in conf["fs.s3a.aws.credentials.provider"]
    assert conf["fs.s3a.endpoint.region"] == "eu-west-1"
    assert conf["fs.s3a.endpoint"] == "https://minio.local:9000"
    assert conf["fs.s3a.path.style.access"] == "true"
    # S3ClientSettings defaults: paging 1000, 5 retries, 100ms base delay
    assert conf["fs.s3a.paging.maximum"] == "1000"
    assert conf["fs.s3a.retry.limit"] == "5"
    assert conf["fs.s3a.retry.interval"] == "100ms"


def test_s3_provider_chain_when_no_keys():
    conf = S3StorageSettings().hadoop_conf()
    assert "fs.s3a.access.key" not in conf  # default provider chain


def test_apply_lands_on_session_hadoop_conf(spark):
    applied = apply_storage_auth(
        spark,
        [
            AzureStorageSettings(account_name="acct", access_key="k1"),
            S3StorageSettings(region="us-east-2"),
        ],
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        assert hconf.get(k) == v
    assert hconf.get("fs.azure.account.key.acct.dfs.core.windows.net") == "k1"
    assert hconf.get("fs.s3a.endpoint.region") == "us-east-2"
