"""Environment-variable configuration (reference lib_env.py re-expressed).

The reference reads POSTGRES_HOST/USER/PASSWORD/DATABASE with fail-fast
KeyError on unset vars (reference lib_land_registry_data/lib_env.py:14-26)
and builds six connection-string flavors (lib_env.py:28-68).  Spark needs the
JDBC flavor; the psycopg flavor is kept for the optional COPY fast-path sink.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class DatabaseConfig:
    host: str
    user: str
    password: str
    database: str
    port: int = 5432  # fixed in the reference (lib_env.py)

    @classmethod
    def from_env(cls) -> "DatabaseConfig":
        """Fail-fast on missing vars, like the reference's direct
        ``os.environ[...]`` access (lib_env.py:14-17)."""
        return cls(
            host=os.environ["POSTGRES_HOST"],
            user=os.environ["POSTGRES_USER"],
            password=os.environ["POSTGRES_PASSWORD"],
            database=os.environ["POSTGRES_DATABASE"],
        )

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    @property
    def jdbc_options(self) -> dict[str, str]:
        return {
            "url": self.jdbc_url,
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }

    @property
    def psycopg_conninfo(self) -> str:
        """libpq conninfo string for the COPY fast-path sink."""
        return (
            f"host={self.host} port={self.port} dbname={self.database} "
            f"user={self.user} password={self.password}"
        )


#: Source URL of the pp-complete feed (reference main.py:98).
PP_COMPLETE_URL = (
    "http://prod.publicdata.landregistry.gov.uk.s3-website-eu-west-1.amazonaws.com"
    "/pp-complete.txt"
)
