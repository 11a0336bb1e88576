"""Stateful components held once per worker/actor (STRtree, rasters, CART)."""
