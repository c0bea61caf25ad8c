from .field import Field, FieldSet, State

__all__ = ["Field", "FieldSet", "State"]
