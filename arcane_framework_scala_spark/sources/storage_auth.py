"""Blob-store credential → Hadoop connector configuration (S11 residue).

The reference ships authenticated storage clients — Azure shared-key / SAS /
default-credential readers (``services/storage/services/azure/
AzureBlobStorageReader.scala:33-46``, settings at ``models/settings/azure/
AzureStorageConnectionSettings.scala:12-59`` incl. the
``ARCANE_FRAMEWORK__AZURE_STORAGE_ACCESS_KEY`` env fallback) and an S3
client with region/endpoint/path-style/paging/retry knobs
(``services/storage/models/s3/S3ClientSettings.scala:14-41``).

On Spark the byte-moving is Hadoop's: the engine reads ``abfss://`` /
``wasbs://`` / ``s3a://`` URIs through hadoop-azure / hadoop-aws, so the
whole auth surface reduces to mapping the same credential settings onto the
connectors' public configuration keys and landing them on the session's
Hadoop configuration. That keeps secrets out of query text and works
identically on a 1000-executor cluster (the conf ships with the job).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

#: reference env fallback (AzureStorageConnectionSettings.scala:14)
ENV_AZURE_ACCESS_KEY = "ARCANE_FRAMEWORK__AZURE_STORAGE_ACCESS_KEY"


@dataclass(frozen=True)
class AzureStorageSettings:
    """Shared-key / SAS / default-credential selection mirrors the
    reference's ``SharedKeyImpl`` / ``DefaultImpl`` ADT; exactly one of
    ``access_key`` / ``sas_token`` may be set (neither = managed identity /
    workload OAuth, the DefaultAzureCredential analogue)."""

    account_name: str
    access_key: str | None = None
    sas_token: str | None = None
    #: abfss (dfs) endpoint suffix; sovereign clouds override it
    endpoint_suffix: str = "dfs.core.windows.net"

    @staticmethod
    def from_env(account_name: str, env=None) -> "AzureStorageSettings":
        e = os.environ if env is None else env
        return AzureStorageSettings(
            account_name=account_name, access_key=e.get(ENV_AZURE_ACCESS_KEY)
        )

    def hadoop_conf(self) -> dict[str, str]:
        if self.access_key and self.sas_token:
            raise ValueError("set either access_key or sas_token, not both")
        host = f"{self.account_name}.{self.endpoint_suffix}"
        if self.access_key:
            return {
                f"fs.azure.account.auth.type.{host}": "SharedKey",
                f"fs.azure.account.key.{host}": self.access_key,
            }
        if self.sas_token:
            return {
                f"fs.azure.account.auth.type.{host}": "SAS",
                f"fs.azure.sas.token.provider.type.{host}": (
                    "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider"
                ),
                f"fs.azure.sas.fixed.token.{host}": self.sas_token.lstrip("?"),
            }
        # DefaultAzureCredential analogue: OAuth via the workload/MSI chain
        return {
            f"fs.azure.account.auth.type.{host}": "OAuth",
            f"fs.azure.account.oauth.provider.type.{host}": (
                "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
            ),
        }


@dataclass(frozen=True)
class S3StorageSettings:
    """S3ClientSettings parity: region/endpoint/path-style plus listing page
    size and retry shaping; credentials default to the provider chain (env /
    instance profile) exactly like the AWS SDK default in the reference."""

    access_key_id: str | None = None
    secret_access_key: str | None = None
    session_token: str | None = None
    region: str | None = None
    endpoint: str | None = None
    path_style_access: bool = False
    max_results_per_page: int = 1000
    retry_max_attempts: int = 5
    retry_base_delay_ms: int = 100

    @staticmethod
    def from_env(env=None) -> "S3StorageSettings":
        e = os.environ if env is None else env
        return S3StorageSettings(
            access_key_id=e.get("AWS_ACCESS_KEY_ID"),
            secret_access_key=e.get("AWS_SECRET_ACCESS_KEY"),
            session_token=e.get("AWS_SESSION_TOKEN"),
            region=e.get("AWS_REGION") or e.get("AWS_DEFAULT_REGION"),
            endpoint=e.get("AWS_ENDPOINT_URL_S3"),
        )

    def hadoop_conf(self) -> dict[str, str]:
        conf: dict[str, str] = {
            "fs.s3a.paging.maximum": str(self.max_results_per_page),
            "fs.s3a.retry.limit": str(self.retry_max_attempts),
            "fs.s3a.retry.interval": f"{self.retry_base_delay_ms}ms",
        }
        if self.access_key_id:
            conf["fs.s3a.access.key"] = self.access_key_id
        if self.secret_access_key:
            conf["fs.s3a.secret.key"] = self.secret_access_key
        if self.session_token:
            conf["fs.s3a.session.token"] = self.session_token
            conf["fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
        if self.region:
            conf["fs.s3a.endpoint.region"] = self.region
        if self.endpoint:
            conf["fs.s3a.endpoint"] = self.endpoint
        if self.path_style_access:
            conf["fs.s3a.path.style.access"] = "true"
        return conf


def apply_storage_auth(spark, settings) -> dict[str, str]:
    """Land the settings' Hadoop keys on the session (runtime Hadoop conf —
    picked up by every subsequent read/write on matching URIs). Accepts one
    settings object or a list; returns everything that was applied."""
    items = settings if isinstance(settings, (list, tuple)) else [settings]
    applied: dict[str, str] = {}
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for s in items:
        for k, v in s.hadoop_conf().items():
            hconf.set(k, v)
            applied[k] = v
    return applied
