"""RBAC model: users, roles, grants, role inheritance, per-statement
permission checks.

Reference parity: ``datafusion-postgres/src/auth.rs:13-446`` (AuthManager,
role inheritance resolved recursively, superuser bypass, resource matching
including schema→table prefixes) and ``hooks/permissions.rs:44-92``
(statement kind → required permission mapping). Same semantics,
re-expressed as plain Python over the transpiler's statement-kind
classifier.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Permission(Enum):
    SELECT = "select"
    INSERT = "insert"
    UPDATE = "update"
    DELETE = "delete"
    CREATE = "create"
    DROP = "drop"
    ALTER = "alter"
    TRUNCATE = "truncate"
    REFERENCES = "references"
    TRIGGER = "trigger"
    EXECUTE = "execute"
    USAGE = "usage"
    ALL = "all"


# Statement kind -> required permission (hooks/permissions.rs:44-57).
# SET/SHOW/transaction/cursor statements bypass the check (handled by hooks).
STATEMENT_PERMISSIONS = {
    "SELECT": Permission.SELECT,
    "WITH": Permission.SELECT,
    "VALUES": Permission.SELECT,
    "EXPLAIN": Permission.SELECT,
    "INSERT": Permission.INSERT,
    "UPDATE": Permission.UPDATE,
    "DELETE": Permission.DELETE,
    "MERGE": Permission.UPDATE,
    "CREATE": Permission.CREATE,
    "DROP": Permission.DROP,
    "ALTER": Permission.ALTER,
    "TRUNCATE": Permission.TRUNCATE,
    "GRANT": Permission.ALL,
    "REVOKE": Permission.ALL,
}

EXEMPT_KINDS = {"SET", "SHOW", "BEGIN", "START", "COMMIT", "END", "ROLLBACK",
                "ABORT", "DECLARE", "FETCH", "CLOSE", "RESET", "DISCARD", ""}


@dataclass(frozen=True)
class Resource:
    """A grantable object. schema-level grants cover their tables
    (auth.rs resource matching: schema→table prefix)."""

    kind: str              # "table" | "schema" | "database"
    name: str              # "public.orders" | "public" | "postgres"

    def covers(self, other: "Resource") -> bool:
        if self == other:
            return True
        if self.kind == "database":
            return True
        if self.kind == "schema" and other.kind == "table":
            return other.name.startswith(self.name + ".")
        return False


@dataclass
class Grant:
    permission: Permission
    resource: Resource

    def allows(self, perm: Permission, resource: Resource) -> bool:
        perm_ok = self.permission in (perm, Permission.ALL)
        return perm_ok and self.resource.covers(resource)


@dataclass
class Role:
    name: str
    grants: list[Grant] = field(default_factory=list)
    member_of: list[str] = field(default_factory=list)  # parent roles


@dataclass
class User:
    name: str
    password: str | None = None
    superuser: bool = False
    roles: list[str] = field(default_factory=list)


class PermissionDenied(RuntimeError):
    sqlstate = "42501"


class AuthManager:
    """User/role registry + permission resolution (auth.rs:13-446)."""

    def __init__(self):
        self.users: dict[str, User] = {
            "postgres": User("postgres", superuser=True)}
        self.roles: dict[str, Role] = {}

    # -- management --------------------------------------------------------
    def add_user(self, user: User) -> None:
        self.users[user.name] = user

    def add_role(self, role: Role) -> None:
        self.roles[role.name] = role

    def grant(self, role_name: str, permission: Permission,
              resource: Resource) -> None:
        self.roles.setdefault(role_name, Role(role_name)).grants.append(
            Grant(permission, resource))

    def revoke(self, role_name: str, permission: Permission,
               resource: Resource) -> None:
        role = self.roles.get(role_name)
        if role:
            role.grants = [g for g in role.grants
                           if not (g.permission == permission and
                                   g.resource == resource)]

    # -- resolution --------------------------------------------------------
    def _all_roles(self, names: list[str]) -> list[Role]:
        """Transitive closure over role inheritance (recursive resolution
        with cycle protection, auth.rs)."""
        seen: set[str] = set()
        stack = list(names)
        out = []
        while stack:
            nm = stack.pop()
            if nm in seen:
                continue
            seen.add(nm)
            role = self.roles.get(nm)
            if role:
                out.append(role)
                stack.extend(role.member_of)
        return out

    def check(self, user_name: str, perm: Permission,
              resource: Resource) -> bool:
        user = self.users.get(user_name)
        if user is None:
            return False
        if user.superuser:
            return True
        for role in self._all_roles(user.roles):
            if any(g.allows(perm, resource) for g in role.grants):
                return True
        return False

    def check_statement(self, user_name: str, statement_kind: str,
                        resource: Resource) -> None:
        """Raise PermissionDenied (42501) unless allowed. SET/SHOW/txn
        kinds are exempt (permissions.rs: skipped statement kinds)."""
        kind = statement_kind.upper()
        if kind in EXEMPT_KINDS:
            return
        perm = STATEMENT_PERMISSIONS.get(kind, Permission.SELECT)
        if not self.check(user_name, perm, resource):
            raise PermissionDenied(
                f"permission denied for user {user_name}: requires "
                f"{perm.value} on {resource.name}")


# -- password verification (AuthSource analog, auth.rs:461-596) -------------

def verify_cleartext(auth: AuthManager, user: str, password: str) -> bool:
    u = auth.users.get(user)
    return u is not None and (u.password is None or u.password == password)


def verify_md5(auth: AuthManager, user: str, md5_response: str,
               salt: bytes) -> bool:
    import hashlib

    u = auth.users.get(user)
    if u is None or u.password is None:
        return False
    inner = hashlib.md5((u.password + user).encode()).hexdigest()
    expected = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
    return md5_response == expected
