"""Physics and stencil operators."""
