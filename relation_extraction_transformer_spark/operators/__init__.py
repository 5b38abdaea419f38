"""DataFrame-level operators of the KG-construction engine.

Each module implements one stage of SURVEY §2's inventory as a function
``DataFrame -> DataFrame`` (plus config/broadcast arguments).  Operators
compose lazily; nothing here triggers an action.
"""
